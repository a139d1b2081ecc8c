"""Infer CLI: query routing, evidence clamping, mesh sharding, model IO.

The serving surface over the inference stack (the reference oracle's
``px.infer``/``px.sample`` query set, /root/reference/eval.py:92-113).
"""

import json

import numpy as np
import pytest

import jax

from qcmrf_tpu.models import elimination as ve
from qcmrf_tpu.models import moments
from qcmrf_tpu.models import sample as msample
from qcmrf_tpu.models import train as mtrain
from qcmrf_tpu.models.mrf import MRF
from qcmrf_tpu.runners import infer_cli

CLIQUES = [[i, i + 1] for i in range(5)] + [[0, 3]]


@pytest.fixture()
def model_file(tmp_path):
    rng = np.random.RandomState(3)
    probe = MRF.create(CLIQUES)
    theta = -np.abs(rng.randn(probe.dimension))
    path = tmp_path / "fitted_model.json"
    with open(path, "w") as f:
        json.dump({"cliques": CLIQUES, "theta": theta.tolist()}, f)
    return str(path), MRF.create(CLIQUES, theta=theta)


def _run(model_path, *extra):
    return infer_cli.main(["--model", model_path, *extra])


def test_infer_queries_match_library(model_file, capsys):
    path, mrf = model_file
    r = _run(path, "--query", "lnz")
    assert r["backend"] == "elimination"
    assert np.isclose(r["lnz"], float(ve.log_partition(mrf)), rtol=1e-6)
    # stdout carries the same JSON line (the serving contract)
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1]
                      )["lnz"] == r["lnz"]

    r = _run(path, "--query", "lnz", "--evidence", "0=1,3=0")
    assert np.isclose(r["log_mass"],
                      float(ve.log_partition_clamped(mrf, {0: 1, 3: 0})),
                      rtol=1e-6)

    r = _run(path, "--query", "prob", "--of", "2=1", "--evidence", "0=1")
    assert np.isclose(r["prob"],
                      float(ve.conditional_prob(mrf, 2, 1, {0: 1})),
                      rtol=1e-5)

    r = _run(path, "--query", "map", "--evidence", "1=1")
    sid, val = msample.map_state_clamped(mrf, {1: 1})
    assert r["state_id"] == sid
    assert np.isclose(r["beta_logpot"], val, rtol=1e-5)
    assert r["state_bits"][1] == 1

    r = _run(path, "--query", "marginals", "--evidence", "0=1")
    want = np.asarray(moments.clique_marginals_clamped_streaming(
        mrf, {0: 1}), np.float64)
    np.testing.assert_allclose(np.asarray(r["marginals"]), want, atol=2e-5)

    r = _run(path, "--query", "sample", "--num-samples", "6",
             "--evidence", "4=0", "--method", "exact")
    s = np.asarray(r["samples"])
    assert s.shape == (6, mrf.n) and (s[:, 4] == 0).all()
    want = np.asarray(msample.sample_conditional(
        jax.random.PRNGKey(0), mrf, 6, {4: 0}))
    np.testing.assert_array_equal(s, want)


def test_infer_wide_routes_to_streaming(model_file, monkeypatch):
    """Induced width past the elimination cap routes every query through
    the streaming backend, with identical answers."""
    path, mrf = model_file
    monkeypatch.setattr(mtrain, "_ELIM_WIDTH_CAP", 1)
    r = _run(path, "--query", "lnz")
    assert r["backend"] == "streaming"
    assert np.isclose(r["lnz"], float(ve.log_partition(mrf)), rtol=1e-6)

    # sampler feasibility is keyed by free-variable count, not width:
    # the table-exact sampler still serves a wide-but-small model
    r = _run(path, "--query", "sample", "--num-samples", "3",
             "--evidence", "0=1")
    assert r["method"] == "exact" and "note" not in r
    assert (np.asarray(r["samples"])[:, 0] == 1).all()


def test_infer_mesh_matches_single_device(model_file):
    path, mrf = model_file
    r = _run(path, "--query", "lnz", "--mesh", "4x2")
    assert r["backend"] == "streaming"
    assert np.isclose(r["lnz"], float(ve.log_partition(mrf)), rtol=1e-5)
    r = _run(path, "--query", "marginals", "--mesh", "4x2",
             "--evidence", "2=1")
    want = np.asarray(moments.clique_marginals_clamped_streaming(
        mrf, {2: 1}), np.float64)
    np.testing.assert_allclose(np.asarray(r["marginals"]), want, atol=2e-5)
    r = _run(path, "--query", "mmap", "--max-vars", "0,4", "--mesh", "4x2",
             "--evidence", "2=1")
    want_a, want_v = ve.marginal_map(mrf, [0, 4], {2: 1})
    assert r["max_vars"] == {str(v): b for v, b in want_a.items()}
    assert np.isclose(r["log_mass"], want_v, rtol=1e-5)


def test_infer_tiny_model_with_mesh_drops_to_single_device():
    """A model smaller than the mesh (n=2 on 8 devices) must answer on
    a single device, not crash in the per-device slice arithmetic —
    including the NO-evidence marginals early path, which bypassed the
    fit-mesh guard (round-4 review finding)."""
    import qcmrf_tpu.models.moments as moments
    from qcmrf_tpu.models import elimination as ve2
    from qcmrf_tpu.models.mrf import chain_mrf

    r = infer_cli.main(["--graph", "chain:2", "--query", "marginals",
                        "--mesh", "4x2"])
    want = np.asarray(
        moments.clique_marginals_clamped_streaming(chain_mrf(2), {}),
        np.float64)
    np.testing.assert_allclose(np.asarray(r["marginals"]), want,
                               atol=2e-5)


def test_infer_sample_exempt_from_streaming_guard(monkeypatch):
    """--query sample must not hit the top-level streaming-cap guard:
    its feasibility is per-method on the reduced model. chain:48 with
    --mesh previously exited 'n=48 ... caps at n=47' even though exact
    sampling never touches the sweep (round-4 review finding)."""
    r = infer_cli.main(["--graph", "chain:48", "--query", "sample",
                        "--method", "exact", "--mesh", "4x2",
                        "--num-samples", "3", "--evidence", "0=1"])
    assert r["method"] == "exact"
    assert "single-device" in r["note"]
    assert len(r["samples"]) == 3 and len(r["samples"][0]) == 48
    assert all(s[0] == 1 for s in r["samples"])


def test_infer_mmap_feasibility_is_swept_size(monkeypatch):
    """Streaming mmap clamps evidence AND the max bits per sweep, so
    feasibility is the SWEPT size n - |ev| - |M|, not the full n: an
    n=52 model with enough evidence answers, and the refusal message
    names the swept size (round-4 review finding)."""
    from qcmrf_tpu.models import train as mtrain

    monkeypatch.setattr(mtrain, "_ELIM_WIDTH_CAP", 1)  # force streaming
    ev = ",".join(f"{v}=0" for v in range(4, 44))  # 40 observed
    r = infer_cli.main(["--graph", "chain:52", "--query", "mmap",
                        "--max-vars", "0,1", "--evidence", ev])
    assert r["backend"] == "streaming"
    assert set(r["max_vars"]) == {"0", "1"}
    with pytest.raises(SystemExit, match="each clamped sweep covers 50"):
        infer_cli.main(["--graph", "chain:52", "--query", "mmap",
                        "--max-vars", "0,1"])


def test_infer_graph_theta_and_out(tmp_path):
    rng = np.random.RandomState(1)
    theta_path = tmp_path / "theta.json"
    with open(theta_path, "w") as f:
        json.dump((-np.abs(rng.randn(16))).tolist(), f)
    out_path = tmp_path / "result.json"
    r = infer_cli.main(["--graph", "chain:5", "--theta", str(theta_path),
                        "--query", "map", "--out", str(out_path)])
    with open(out_path) as f:
        assert json.load(f)["state_id"] == r["state_id"]


def test_infer_mmap_query(model_file, monkeypatch):
    path, mrf = model_file
    r = _run(path, "--query", "mmap", "--max-vars", "1,4",
             "--evidence", "0=1")
    want_a, want_v = ve.marginal_map(mrf, [1, 4], {0: 1})
    assert r["max_vars"] == {str(v): b for v, b in want_a.items()}
    assert np.isclose(r["log_mass"], want_v, rtol=1e-6)

    # wide route: streaming enumeration over the max set agrees
    monkeypatch.setattr(mtrain, "_ELIM_WIDTH_CAP", 1)
    rs = _run(path, "--query", "mmap", "--max-vars", "1,4",
              "--evidence", "0=1")
    assert rs["backend"] == "streaming"
    assert rs["max_vars"] == r["max_vars"]
    assert np.isclose(rs["log_mass"], r["log_mass"], rtol=1e-5)

    with pytest.raises(SystemExit, match="--max-vars"):
        _run(path, "--query", "mmap")
    with pytest.raises(SystemExit, match="bad --max-vars"):
        _run(path, "--query", "mmap", "--max-vars", "a,b")


def test_infer_duplicate_assignment_rejected(model_file):
    path, mrf = model_file
    with pytest.raises(SystemExit, match="assigned twice"):
        _run(path, "--query", "lnz", "--evidence", "0=1,0=0")
    # an identical repeat is not a conflict
    r = _run(path, "--query", "lnz", "--evidence", "0=1;0=1")
    assert np.isclose(r["log_mass"],
                      float(ve.log_partition_clamped(mrf, {0: 1})),
                      rtol=1e-6)


def test_infer_sample_routes_by_feasibility(monkeypatch):
    """'exact' past the table cap stays EXACT for bounded reduced width
    (elimination's ancestral sampler serves any n); only a model with
    neither an enumerable table nor a bounded width reroutes to 'pam',
    saying so."""
    r = infer_cli.main(["--graph", "chain:40", "--query", "sample",
                        "--num-samples", "3"])
    assert r["method"] == "exact"
    assert "note" not in r
    assert len(r["samples"]) == 3 and len(r["samples"][0]) == 40

    from qcmrf_tpu.models import train as mtrain
    monkeypatch.setattr(mtrain, "_ELIM_WIDTH_CAP", 1)  # force "wide"
    r = infer_cli.main(["--graph", "chain:40", "--query", "sample",
                        "--num-samples", "3"])
    assert r["method"] == "pam"
    assert "routed to 'pam'" in r["note"]
    assert len(r["samples"]) == 3 and len(r["samples"][0]) == 40


def test_infer_mesh_does_not_change_sampler(model_file):
    """--mesh must not silently swap the requested exact sampler for
    the approximate PAM one; it shards PAM only, and says so."""
    path, _ = model_file
    r = _run(path, "--query", "sample", "--method", "exact",
             "--mesh", "2x1", "--num-samples", "4", "--sample-seed", "7")
    assert r["method"] == "exact"
    assert "single-device" in r["note"]
    single = _run(path, "--query", "sample", "--method", "exact",
                  "--num-samples", "4", "--sample-seed", "7")
    assert r["samples"] == single["samples"]


def test_infer_argument_errors(model_file):
    path, _ = model_file
    with pytest.raises(SystemExit):
        infer_cli.main(["--query", "lnz"])  # no model/graph
    with pytest.raises(SystemExit):
        _run(path, "--query", "prob")  # missing --of
    with pytest.raises(SystemExit):
        _run(path, "--query", "prob", "--of", "1=1,2=0")
    with pytest.raises(SystemExit):
        _run(path, "--query", "lnz", "--evidence", "0:1")
    with pytest.raises(ValueError, match="out of range"):
        _run(path, "--query", "lnz", "--evidence", "99=1")


def test_infer_mmap_routes_on_constrained_width(tmp_path, monkeypatch):
    """mmap routing keys on the CONSTRAINED elimination width, not the
    plain induced width: a star maxed over many leaves (induced width 2)
    must not reach the dense constrained pass (round-4 review finding),
    and --mesh alone must not force a narrow structure off the
    single-pass elimination backend."""
    k = 30
    star = [[0, i] for i in range(1, k + 1)]
    rng = np.random.RandomState(7)
    probe = MRF.create(star)
    path = tmp_path / "star.json"
    with open(path, "w") as f:
        json.dump({"cliques": star,
                   "theta": (-np.abs(rng.randn(probe.dimension))).tolist()},
                  f)
    # constrained width k+1 = 31 > cap, and 2^30 sweeps > streaming cap:
    # a clear refusal, not an OOM
    with pytest.raises(SystemExit, match="constrained elimination width"):
        _run(str(path), "--query", "mmap",
             "--max-vars", ",".join(str(v) for v in range(1, k + 1)))
    # a small max set keeps the constrained width bounded -> elimination,
    # even with --mesh (previously --mesh forced 2^|M| sharded sweeps)
    mrf = MRF.create(star, theta=np.asarray(
        json.load(open(path))["theta"], np.float64))
    r = _run(str(path), "--query", "mmap", "--max-vars", "1,2,3",
             "--mesh", "4x2")
    assert r["backend"] == "elimination"
    assert "unused" in r["note"]
    want_a, want_v = ve.marginal_map(mrf, [1, 2, 3])
    assert r["max_vars"] == {str(v): b for v, b in want_a.items()}
    assert np.isclose(r["log_mass"], want_v, rtol=1e-5)


def test_infer_mesh_smaller_than_reduced_model(model_file, monkeypatch):
    """Evidence can shrink the free-variable model below the mesh size
    (n=6 model, 8-device mesh); every sharded query must fall back to
    the single-device backend — identical answers — instead of crashing
    with a negative shift count (round-4 review finding)."""
    path, mrf = model_file
    ev, evd = "0=1,2=0,3=1,5=0", {0: 1, 2: 0, 3: 1, 5: 0}

    r = _run(path, "--query", "lnz", "--mesh", "4x2", "--evidence", ev)
    assert np.isclose(r["log_mass"],
                      float(ve.log_partition_clamped(mrf, evd)), rtol=1e-5)

    r = _run(path, "--query", "marginals", "--mesh", "4x2",
             "--evidence", ev)
    want = np.asarray(moments.clique_marginals_clamped_streaming(
        mrf, evd), np.float64)
    np.testing.assert_allclose(np.asarray(r["marginals"]), want, atol=2e-5)

    r = _run(path, "--query", "map", "--mesh", "4x2", "--evidence", ev)
    sid, val = msample.map_state_clamped(mrf, evd)
    assert r["state_id"] == sid and np.isclose(r["beta_logpot"], val,
                                               rtol=1e-5)

    r = _run(path, "--query", "sample", "--method", "pam", "--mesh",
             "4x2", "--evidence", ev, "--num-samples", "4")
    s = np.asarray(r["samples"])
    assert s.shape == (4, mrf.n)
    assert (s[:, 0] == 1).all() and (s[:, 2] == 0).all()

    # the review's exact crash: mmap forced onto the streaming route
    # with nf < log2(devices) inside each clamped sweep
    monkeypatch.setattr(mtrain, "_ELIM_WIDTH_CAP", 1)
    r = _run(path, "--query", "mmap", "--max-vars", "0,1,4",
             "--evidence", "2=1", "--mesh", "4x2")
    assert r["backend"] == "streaming"
    want_a, want_v = ve.marginal_map(mrf, [0, 1, 4], {2: 1})
    assert r["max_vars"] == {str(v): b for v, b in want_a.items()}
    assert np.isclose(r["log_mass"], want_v, rtol=1e-5)


def test_infer_batch_queries(model_file, tmp_path, capsys):
    """--queries answers a JSONL batch in one process, each line equal to
    the corresponding single-query invocation; JSON-native evidence
    dicts and max_vars lists coerce to the flag formats."""
    path, mrf = model_file
    qfile = tmp_path / "queries.jsonl"
    out = tmp_path / "answers.jsonl"
    qfile.write_text("\n".join(json.dumps(q) for q in [
        {"query": "lnz"},
        {"query": "lnz", "evidence": {"0": 1}},
        {"query": "prob", "of": "3=1", "evidence": "1=0"},
        {"query": "map"},
        {"query": "mmap", "max_vars": [0, 2]},
        {"query": "sample", "num_samples": 5, "sample_seed": 7},
    ]) + "\n")
    batch = infer_cli.main(["--model", path, "--queries", str(qfile),
                            "--out", str(out)])
    assert [r["index"] for r in batch] == list(range(6))
    singles = [
        _run(path, "--query", "lnz"),
        _run(path, "--query", "lnz", "--evidence", "0=1"),
        _run(path, "--query", "prob", "--of", "3=1", "--evidence", "1=0"),
        _run(path, "--query", "map"),
        _run(path, "--query", "mmap", "--max-vars", "0,2"),
        _run(path, "--query", "sample", "--num-samples", "5",
             "--sample-seed", "7"),
    ]
    for got, want in zip(batch, singles):
        got = dict(got)
        got.pop("index")
        assert got == want
    # --out carries the same lines
    lines = [json.loads(x) for x in out.read_text().splitlines()]
    assert lines == batch
    capsys.readouterr()


def test_infer_batch_rejects_unknown_keys(model_file, tmp_path, capsys):
    path, _ = model_file
    qfile = tmp_path / "queries.jsonl"
    qfile.write_text('{"query": "lnz", "mesh": "2x1"}\n')
    with pytest.raises(SystemExit, match="unknown keys"):
        infer_cli.main(["--model", path, "--queries", str(qfile)])
    capsys.readouterr()
