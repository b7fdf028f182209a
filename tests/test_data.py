"""Interaction/graph data layer tests: id maps, adjacency normalisation,
test-set filtering, CSR helpers — against scipy ground truth."""

import numpy as np
import pytest
import scipy.sparse as sp

from selfrec_tpu.config import ModelConf
from selfrec_tpu.data.graph import normalize_graph_mat
from selfrec_tpu.data.interaction import Interaction


@pytest.fixture(scope="module")
def inter(tiny_graph_dataset_mod, tiny_conf_mod):
    train, test = tiny_graph_dataset_mod
    return Interaction(tiny_conf_mod, train, test)


@pytest.fixture(scope="module")
def tiny_graph_dataset_mod():
    rng = np.random.default_rng(7)
    train, test = [], []
    for u in range(40):
        items = rng.choice(60, size=rng.integers(4, 12), replace=False)
        for i in items[:-1]:
            train.append((f"u{u}", f"i{i}", 1.0))
        test.append((f"u{u}", f"i{items[-1]}", 1.0))
    return train, test


@pytest.fixture(scope="module")
def tiny_conf_mod():
    return ModelConf(
        {
            "model": {"name": "MF", "type": "graph"},
            "item.ranking.topN": [10],
        }
    )


def test_id_maps_first_seen_order(inter):
    first_user = inter.training_data[0][0]
    assert inter.user[first_user] == 0
    assert inter.id2user[0] == first_user
    assert len(inter.user) == inter.user_num


def test_test_set_filtered_to_train_seen(tiny_conf_mod):
    train = [("u0", "i0", 1.0), ("u0", "i1", 1.0), ("u1", "i0", 1.0)]
    test = [("u0", "i1", 1.0), ("u_unseen", "i0", 1.0), ("u1", "i_unseen", 1.0)]
    inter = Interaction(tiny_conf_mod, train, test)
    assert list(inter.test_set.keys()) == ["u0"]
    assert inter.test_size()[2] == 3  # raw count preserved


def test_normalize_square_symmetric():
    a = sp.csr_matrix(np.array([[0, 1, 1], [1, 0, 0], [1, 0, 0]], dtype=np.float32))
    n = normalize_graph_mat(a).toarray()
    d = np.array([2.0, 1.0, 1.0])
    expected = a.toarray() / np.sqrt(d[:, None] * d[None, :])
    np.testing.assert_allclose(n, expected, rtol=1e-6)


def test_normalize_rectangular_row_stochastic():
    a = sp.csr_matrix(np.array([[1, 1, 0], [0, 0, 2]], dtype=np.float32))
    n = normalize_graph_mat(a).toarray()
    np.testing.assert_allclose(n.sum(1), [1.0, 1.0], rtol=1e-6)


def test_norm_adj_edges_match_scipy(inter):
    dense = inter.norm_adj.toarray()
    rebuilt = np.zeros_like(dense)
    rebuilt[inter.adj_dst, inter.adj_src] = inter.adj_w
    np.testing.assert_allclose(rebuilt, dense, rtol=1e-6)


def test_rated_csr_sorted_and_complete(inter):
    for u_name, items in inter.training_set_u.items():
        uid = inter.user[u_name]
        ids = inter.user_rated_ids(uid)
        assert np.all(np.diff(ids) > 0)
        assert set(ids.tolist()) == {inter.item[i] for i in items}


def test_interaction_mat_matches_row(inter):
    m = inter.matrix()
    for uid in range(min(5, inter.user_num)):
        np.testing.assert_array_equal(m[uid], inter.row(uid))


def test_convert_to_laplacian_mat(inter):
    lap = inter.convert_to_laplacian_mat(inter.interaction_mat)
    n = inter.user_num + inter.item_num
    assert lap.shape == (n, n)
    # full (undropped) interaction matrix should reproduce norm_adj
    np.testing.assert_allclose(lap.toarray(), inter.norm_adj.toarray(), rtol=1e-6)


def test_interaction_mapped_path_parity(tiny_graph_dataset):
    """Array-native constructor == triple constructor on every surface."""
    import numpy as np

    from selfrec_tpu.data.interaction import Interaction

    train, test = tiny_graph_dataset
    d1 = Interaction(None, train, test)
    # build the mapped 5-tuple with the same first-seen order
    users, items = {}, {}
    src, dst = [], []
    for u, i, _ in train:
        src.append(users.setdefault(u, len(users)))
        dst.append(items.setdefault(i, len(items)))
    mapped = (
        np.array(src, np.int32),
        np.array(dst, np.int32),
        np.ones(len(src), np.float32),
        list(users),
        list(items),
    )
    d2 = Interaction(None, mapped, test)
    assert (d1.user, d1.item) == (d2.user, d2.item)
    np.testing.assert_array_equal(d1.edge_users, d2.edge_users)
    np.testing.assert_array_equal(d1.rated_items, d2.rated_items)
    assert d1.test_set == d2.test_set
    assert d1.training_set_u == d2.training_set_u  # lazy view parity
    assert d1.training_size() == d2.training_size()
    assert abs(d1.norm_adj - d2.norm_adj).max() < 1e-7


def test_set_dotted_creates_known_sections():
    from selfrec_tpu.config import ModelConf

    conf = ModelConf({"model": {"name": "SimGCL", "type": "graph"}})
    conf.set_dotted("mesh.data", "4")
    conf.set_dotted("mesh.model", "2")
    conf.set_dotted("SimGCL.lambda", "0.2")
    conf.set_dotted("checkpoint.dir", "/tmp/x")
    assert conf["mesh"] == {"data": 4, "model": 2}
    assert conf["SimGCL"]["lambda"] == 0.2
    assert conf["checkpoint.dir"] == "/tmp/x"  # literal, not nested
