"""Invariant + naive-equivalence tests for the round-12 post-sweep
additions (SQ8 asymmetric search, Matryoshka over-fetch audit). The
cross-engine value gate is check_oracle/the driver; these recompute the
full pipelines driver-side with numpy on the same fixed-point grid, so a
hash mismatch has a named mathematical witness.
"""

from __future__ import annotations

import numpy as np

from app_insights_generator_spark.queries import QUERIES
from app_insights_generator_spark.sources import load_table

_SCALE, _OFF = 1_000_000, 1_000_000


def _long_form(spark, sf_dir):
    """(vid -> int64[64]) on the shared fixed-point grid: v = floor(x
    [as double] * scale) + offset, the quantized_long_form recipe."""
    rows = load_table(spark, sf_dir, "embeddings").collect()
    return {
        r.vec_id: np.floor(
            np.array(r.embedding, dtype=np.float64) * _SCALE
        ).astype(np.int64)
        + _OFF
        for r in rows
    }


def test_sq8_adc_naive_equivalence(spark, sf_dir):
    vecs = _long_form(spark, sf_dir)
    mat = np.stack([vecs[i] for i in sorted(vecs)])
    vmin, vmax = mat.min(axis=0), mat.max(axis=0)
    rng = vmax - vmin
    safe = np.where(rng == 0, 1, rng)
    codes = np.where(rng == 0, 0, ((mat - vmin) * 255) // safe)
    recon = vmin + (codes * rng) // 255
    ids = np.array(sorted(vecs))
    qv = vecs[0]
    cand = ids != 0
    exact = ((mat - qv) ** 2).sum(axis=1)
    sq8 = ((recon - qv) ** 2).sum(axis=1)
    order_e = sorted(zip(exact[cand], ids[cand]))
    order_s = sorted(zip(sq8[cand], ids[cand]))
    erank = {vid: i + 1 for i, (_, vid) in enumerate(order_e)}
    srank = {vid: i + 1 for i, (_, vid) in enumerate(order_s)}
    got = {r.vec_id: r for r in QUERIES["sq8_adc_search_embeddings"](
        spark, sf_dir
    ).collect()}
    assert set(got) == {vid for _, vid in order_e[:10]}
    by_id = {vid: i for i, vid in enumerate(ids)}
    for vid, r in got.items():
        i = by_id[vid]
        assert r.exact_dist == exact[i], vid
        assert r.sq8_dist == sq8[i], vid
        assert r.exact_rank == erank[vid], vid
        assert r.sq8_rank == srank[vid], vid
    # 8-bit reconstruction error per dim is < one code step, so the
    # distance distortion is bounded: |sqrt(sq8) - sqrt(exact)| <=
    # ||recon - v||_2 <= sqrt(64) * max_step (codes round DOWN, one-sided).
    max_step = int(np.ceil(rng.max() / 255)) + 1
    bound = np.sqrt(64) * max_step
    for vid, r in got.items():
        assert abs(np.sqrt(r.sq8_dist) - np.sqrt(r.exact_dist)) <= bound, vid


def test_matryoshka_prefix_naive_equivalence_and_monotonicity(spark, sf_dir):
    vecs = _long_form(spark, sf_dir)
    ids = np.array(sorted(vecs))
    mat = np.stack([vecs[i] for i in ids])
    qv = vecs[0]
    cand = ids != 0
    sq = (mat - qv) ** 2
    dists = {
        "full": sq.sum(axis=1),
        "p16": sq[:, :16].sum(axis=1),
        "p32": sq[:, :32].sum(axis=1),
    }
    ranks = {
        k: {vid: i + 1 for i, (_, vid) in enumerate(sorted(zip(d[cand], ids[cand])))}
        for k, d in dists.items()
    }
    got = {r.vec_id: r for r in QUERIES["matryoshka_prefix_recall_embeddings"](
        spark, sf_dir
    ).collect()}
    top10 = {vid for vid, rk in ranks["full"].items() if rk <= 10}
    assert set(got) == top10
    by_id = {vid: i for i, vid in enumerate(ids)}
    for vid, r in got.items():
        i = by_id[vid]
        assert r.full_dist == dists["full"][i], vid
        assert r.p16_dist == dists["p16"][i], vid
        assert r.p32_dist == dists["p32"][i], vid
        assert r.full_rank == ranks["full"][vid], vid
        assert r.p16_rank == ranks["p16"][vid], vid
        assert r.p32_rank == ranks["p32"][vid], vid
        # Prefix distances nest: each wider prefix adds nonnegative terms.
        assert r.p16_dist <= r.p32_dist <= r.full_dist, vid
