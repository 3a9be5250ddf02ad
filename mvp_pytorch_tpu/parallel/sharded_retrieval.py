"""Corpus-scale coarse retrieval scoring, sharded over the device mesh.

Role (BASELINE.json north star): "retrieval scoring shards the
image x caption embedding matmul across ICI for corpus-scale eval". The
reference materializes the full sim matrix on one device
(`full_sims = img_emb @ txt_emb.T`, /root/reference/oscar/run_retrieval.py:735-740)
— fine at Flickr scale (1k x 5k), impossible at corpus scale. This module
computes the same outputs (rerank shortlists + coarse ranks) with

  - query rows sharded over the mesh `data` axis: each device scores only
    its row shard against the gallery, so the big matmul parallelizes
    across chips and only the tiny [rows, k] shortlist is assembled;
  - the gallery scanned in fixed-size blocks with a running top-k carry,
    so the [n_query, n_gallery] matrix never exists in any single HBM —
    peak device memory is O(rows_per_device * (block + k)).

Exactness: every score is the same dot product the dense path computes
(blocks tile the gallery axis, not the contraction axis), so candidate
sets, shortlist scores, and ranks are exact on tie-free inputs; ties at
the k boundary resolve to the lowest gallery index (same as a dense
`jax.lax.top_k`), while the reference's tie order is an `np.argsort`
introsort accident no streaming algorithm can reproduce. The default
in-memory path in tasks/retrieval.py stays bit-exact vs the reference;
this path is the scale mode (`--coarse_block`).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _pad_gallery(g: jnp.ndarray, block: int) -> Tuple[jnp.ndarray, int]:
    n = g.shape[0]
    pad = (-n) % block
    if pad:
        g = jnp.concatenate([g, jnp.zeros((pad, g.shape[1]), g.dtype)])
    return g, n


@partial(jax.jit, static_argnames=("k", "block"))
def streaming_topk(q: jnp.ndarray, g: jnp.ndarray, k: int, block: int
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k gallery scores per query row without the full sim matrix.

    q: [Nq, D] queries, g: [Ng, D] gallery. Returns (scores [Nq, k],
    ids [Nq, k]) sorted descending; k must be <= Ng. Row-parallel: under a
    sharded q the scan runs independently per shard (no collectives until
    the caller gathers the [Nq, k] result).
    """
    nq, d = q.shape
    g_pad, ng = _pad_gallery(g, block)
    n_blocks = g_pad.shape[0] // block
    g_blocks = g_pad.reshape(n_blocks, block, d)
    neg = jnp.asarray(-jnp.inf, q.dtype)

    def step(carry, blk):
        vals, ids = carry
        g_b, base = blk
        s = q @ g_b.T                                   # [Nq, block]
        col = base + jnp.arange(block)
        s = jnp.where(col[None, :] < ng, s, neg)        # mask gallery pad
        cand_v = jnp.concatenate([vals, s], axis=1)
        cand_i = jnp.concatenate(
            [ids, jnp.broadcast_to(col[None, :], (nq, block))], axis=1)
        top_v, pos = jax.lax.top_k(cand_v, k)
        top_i = jnp.take_along_axis(cand_i, pos, axis=1)
        return (top_v, top_i), None

    init = (jnp.full((nq, k), neg),
            jnp.full((nq, k), jnp.iinfo(jnp.int32).max, jnp.int32))
    bases = jnp.arange(n_blocks) * block
    (vals, ids), _ = jax.lax.scan(step, init, (g_blocks, bases))
    return vals, ids


@partial(jax.jit, static_argnames=("block",))
def streaming_rank(q: jnp.ndarray, g: jnp.ndarray, correct_ids: jnp.ndarray,
                   block: int) -> jnp.ndarray:
    """0-based coarse rank of the best correct gallery item per query.

    correct_ids: [Nq, C] gallery ids owned by each query (C = captions
    per image for i2t, 1 for t2i). rank = #{incorrect j : s_j > max
    correct score} — identical to `coarse_ranks` (first-correct position
    in descending order; everything ranked above it is incorrect) on
    tie-free scores; ties resolve optimistically. Correct items are
    EXCLUDED from the count rather than relied on to fail the strict
    inequality: the threshold is computed by einsum while the sweep is a
    block matmul, and the same dot product computed two ways can differ
    by an ulp (measured), which would off-by-one the rank.
    """
    g_pad, ng = _pad_gallery(g, block)
    n_blocks = g_pad.shape[0] // block
    g_blocks = g_pad.reshape(n_blocks, block, g.shape[1])

    own = jnp.take(g_pad, correct_ids, axis=0)          # [Nq, C, D]
    best = jnp.max(jnp.einsum("nd,ncd->nc", q, own), axis=1)   # [Nq]

    def step(count, blk):
        g_b, base = blk
        s = q @ g_b.T                                   # [Nq, block]
        col = base + jnp.arange(block)
        valid = col[None, :] < ng
        is_correct = jnp.any(
            col[None, :, None] == correct_ids[:, None, :], axis=-1)
        count = count + jnp.sum(
            (s > best[:, None]) & valid & ~is_correct, axis=1)
        return count, None

    bases = jnp.arange(n_blocks) * block
    count, _ = jax.lax.scan(step, jnp.zeros(q.shape[0], jnp.int32),
                            (g_blocks, bases))
    return count


def _row_sharded(x: jnp.ndarray, mesh: Mesh, ndev: int) -> jnp.ndarray:
    """Pad rows to a device multiple and shard them over ALL mesh axes
    (flattened), so every device gets a query-row shard."""
    pad = (-x.shape[0]) % ndev
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    full = tuple(mesh.axis_names)
    return jax.device_put(
        x, NamedSharding(mesh, P(full, *([None] * (x.ndim - 1)))))


def sharded_coarse_eval(img_glob, txt_glob, caps_per_img: int,
                        k_i2t: int, k_t2i: int,
                        mesh: Optional[Mesh] = None, block: int = 4096):
    """Corpus-scale replacement for the dense coarse stage: rerank
    shortlists + coarse ranks in both directions, queries sharded over
    `mesh`'s devices, gallery streamed in `block`-row tiles.

    Returns numpy (i2t_cands [n_img,k_i2t], t2i_cands [n_cap,k_t2i],
    i2t_ranks [n_img], t2i_ranks [n_cap]) — drop-in for
    `coarse_candidates` + `coarse_ranks` (tasks.retrieval_eval) modulo
    tie order.
    """
    img_glob = jnp.asarray(img_glob)
    txt_glob = jnp.asarray(txt_glob)
    n_img, n_cap = img_glob.shape[0], txt_glob.shape[0]
    block = min(block, max(n_img, n_cap))
    own_caps = jnp.asarray(
        (np.arange(n_img)[:, None] * caps_per_img
         + np.arange(caps_per_img)[None, :]).astype(np.int32))
    own_img = jnp.asarray(
        (np.arange(n_cap) // caps_per_img).astype(np.int32)[:, None])

    sharded = mesh is not None and math.prod(mesh.devices.shape) > 1
    if sharded:
        # each embedding table is placed ONCE per role: row-sharded as
        # the query side, replicated as the gallery side. At corpus
        # scale the replication is an O(N*D) broadcast — doing it per
        # call (2x per array) would double the dominant transfer.
        ndev = math.prod(mesh.devices.shape)
        rep = NamedSharding(mesh, P())
        img_q, txt_q = (_row_sharded(img_glob, mesh, ndev),
                        _row_sharded(txt_glob, mesh, ndev))
        img_gal, txt_gal = (jax.device_put(img_glob, rep),
                            jax.device_put(txt_glob, rep))
        own_caps = _row_sharded(own_caps, mesh, ndev)
        own_img = _row_sharded(own_img, mesh, ndev)
    else:
        img_q, txt_q, img_gal, txt_gal = (img_glob, txt_glob,
                                          img_glob, txt_glob)

    _, i2t_cands = streaming_topk(img_q, txt_gal, k=k_i2t, block=block)
    _, t2i_cands = streaming_topk(txt_q, img_gal, k=k_t2i, block=block)
    i2t_ranks = streaming_rank(img_q, txt_gal, own_caps, block=block)
    t2i_ranks = streaming_rank(txt_q, img_gal, own_img, block=block)
    return (np.asarray(i2t_cands)[:n_img], np.asarray(t2i_cands)[:n_cap],
            np.asarray(i2t_ranks)[:n_img], np.asarray(t2i_ranks)[:n_cap])
