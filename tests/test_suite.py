"""Suite generation: bit-parity with the stored models_{scale}.json files."""

import json
import os

import numpy as np
import pytest

from qcmrf_tpu.models import suite as msuite


def test_graph_constants_match_reference():
    assert msuite.GRAPHS == [
        [[0]],
        [[0, 1]],
        [[0, 1], [1, 2], [2, 3]],
        [[0, 1], [1, 2], [2, 3], [3, 4]],
        [[0, 1, 2]],
        [[0, 1, 2], [2, 3, 4]],
        [[0, 1, 2, 3]],
    ]


@pytest.mark.parametrize("scale", [0.1, 0.25, 0.5])
def test_regeneration_matches_stored(reference_root, scale):
    path = msuite.reference_models_path(scale, reference_root)
    if not os.path.isfile(path):
        pytest.skip(f"no stored suite for scale {scale}")
    stored = msuite.load_suite(path, scale)
    regen = msuite.generate_suite(scale)
    assert regen.graphs == stored.graphs
    for j in range(len(msuite.GRAPHS)):
        got = np.asarray(regen.thetas[j])
        want = np.asarray(stored.thetas[j])
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_suite_shape_and_sign():
    s = msuite.generate_suite(0.25)
    assert s.num_circuits == 70
    for j, C in enumerate(msuite.GRAPHS):
        d = sum(2 ** len(c) for c in C)
        assert len(s.thetas[j]) == 10
        for t in s.thetas[j]:
            assert len(t) == d
            assert all(v <= 0 for v in t)


def test_mrfs_order_graph_major():
    s = msuite.generate_suite(0.1)
    mrfs = s.mrfs()
    assert len(mrfs) == 70
    assert mrfs[0].cliques == ((0,),)
    assert mrfs[10].cliques == ((0, 1),)
    assert mrfs[69].cliques == ((0, 1, 2, 3),)


def test_save_load_roundtrip(tmp_path):
    s = msuite.generate_suite(0.1)
    p = str(tmp_path / "models_0.1.json")
    s.save(p)
    s2 = msuite.load_suite(p)
    assert s2.graphs == s.graphs
    assert s2.scale == 0.1
    np.testing.assert_allclose(
        np.asarray(s2.thetas[3]), np.asarray(s.thetas[3])
    )
    # schema matches the stored reference files
    with open(p) as f:
        d = json.load(f)
    assert set(d.keys()) == {"GRAPHS", "THETAS"}
    assert set(d["THETAS"].keys()) == {str(i) for i in range(7)}
