"""Corpus-scale sharded coarse retrieval scoring (parallel/sharded_retrieval).

The dense path (tasks.retrieval_eval) mirrors the reference's
full_sims = img @ txt.T (run_retrieval.py:735-740); the sharded streaming
path must produce the same shortlists and ranks without ever building the
full matrix, with query rows sharded over the 8-device virtual mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvp_pytorch_tpu.parallel import make_mesh
from mvp_pytorch_tpu.parallel.sharded_retrieval import (
    sharded_coarse_eval, streaming_rank, streaming_topk)
from mvp_pytorch_tpu.tasks.retrieval_eval import (
    coarse_candidates, coarse_ranks)


def _embs(n_img=37, cpi=5, d=16, seed=0):
    rs = np.random.RandomState(seed)
    img = rs.randn(n_img, d).astype(np.float32)
    txt = rs.randn(n_img * cpi, d).astype(np.float32)
    return jnp.asarray(img), jnp.asarray(txt)


def test_streaming_topk_matches_dense():
    img, txt = _embs()
    sims = np.asarray(img @ txt.T)
    for block in (8, 64, 1000):       # non-dividing, small, > gallery
        vals, ids = streaming_topk(img, txt, k=7, block=block)
        dv, di = jax.lax.top_k(jnp.asarray(sims), 7)
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(di))
        np.testing.assert_allclose(np.asarray(vals), np.asarray(dv),
                                   rtol=1e-6)


def test_streaming_rank_matches_dense():
    img, txt = _embs(n_img=23, cpi=3)
    sims = np.asarray(img @ txt.T)
    i2t_d, t2i_d = coarse_ranks(sims, 3)
    own = (np.arange(23)[:, None] * 3 + np.arange(3)[None, :]).astype(
        np.int32)
    i2t = streaming_rank(img, txt, jnp.asarray(own), block=16)
    np.testing.assert_array_equal(np.asarray(i2t), i2t_d)
    own_img = (np.arange(69) // 3).astype(np.int32)[:, None]
    t2i = streaming_rank(txt, img, jnp.asarray(own_img), block=16)
    np.testing.assert_array_equal(np.asarray(t2i), t2i_d)


@pytest.mark.parametrize("n_img,cpi", [(40, 5), (37, 3)])
def test_sharded_coarse_eval_end_to_end(devices, n_img, cpi):
    """Full wrapper on the 8-device mesh == dense candidates + ranks,
    including query counts that don't divide the device count."""
    img, txt = _embs(n_img=n_img, cpi=cpi, seed=1)
    sims = np.asarray(img @ txt.T)
    k_i2t, k_t2i = 9, 4
    mesh = make_mesh(devices)
    i2t_c, t2i_c, i2t_r, t2i_r = sharded_coarse_eval(
        img, txt, cpi, k_i2t, k_t2i, mesh=mesh, block=13)
    dc_i2t, dc_t2i = coarse_candidates(sims, k_i2t, k_t2i)
    dr_i2t, dr_t2i = coarse_ranks(sims, cpi)
    np.testing.assert_array_equal(i2t_c, dc_i2t)
    np.testing.assert_array_equal(t2i_c, dc_t2i)
    np.testing.assert_array_equal(i2t_r, dr_i2t)
    np.testing.assert_array_equal(t2i_r, dr_t2i)


def test_rows_actually_sharded(devices):
    """The row shard really lands one slice per device (ICI-parallel),
    and per-device peak is O(rows/ndev * block), not O(N^2)."""
    mesh = make_mesh(devices)
    img, txt = _embs(n_img=64, cpi=2, seed=2)
    from jax.sharding import NamedSharding, PartitionSpec as P
    qp = jax.device_put(img, NamedSharding(
        mesh, P(tuple(mesh.axis_names), None)))
    vals, ids = streaming_topk(qp, txt, k=3, block=32)
    assert not vals.sharding.is_fully_replicated
    shard_rows = {s.data.shape[0] for s in vals.addressable_shards}
    assert shard_rows == {64 // 8}
    dv, di = jax.lax.top_k(jnp.asarray(img @ txt.T), 3)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(di))
