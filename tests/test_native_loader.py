"""Native C++ loader parity with the Python parser."""

import numpy as np
import pytest

from selfrec_tpu.data import io


@pytest.fixture(scope="module")
def graph_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("d") / "train.txt"
    lines = [
        "u1 i1 1",
        "u2 i1 1",
        "u1 i2 1",
        "u3 i3 0.5",
        "u2 i2 1",
        "",  # blank line skipped
        "u3 i1 1",
    ]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_native_lib_builds():
    from selfrec_tpu import native

    assert native.get_lib() is not None, "g++ toolchain present but build failed"


def test_native_matches_python(graph_file):
    py = io._load_graph_data_py(graph_file)
    nat = io.load_graph_data(graph_file)
    assert [(u, i) for u, i, _ in nat] == [(u, i) for u, i, _ in py]
    np.testing.assert_allclose([w for _, _, w in nat], [w for _, _, w in py])


def test_mapped_first_seen_order(graph_file):
    mapped = io.load_graph_mapped(graph_file)
    assert mapped is not None
    src, dst, w, src_names, dst_names = mapped
    assert src_names == ["u1", "u2", "u3"]
    assert dst_names == ["i1", "i2", "i3"]
    np.testing.assert_array_equal(src, [0, 1, 0, 2, 1, 2])
    np.testing.assert_array_equal(dst, [0, 0, 1, 2, 1, 0])
    np.testing.assert_allclose(w, [1, 1, 1, 0.5, 1, 1])


def test_parity_on_real_dataset():
    path = "/tmp/ab_graph/train.txt"
    import os

    if not os.path.exists(path):
        pytest.skip("amazon-beauty graph-ified file not generated")
    py = io._load_graph_data_py(path)
    nat = io.load_graph_data(path)
    assert len(py) == len(nat)
    assert py[:100] == [(u, i, float(w)) for u, i, w in nat[:100]]
