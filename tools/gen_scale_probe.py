"""Generate a 10x scale-probe dataset ("sf1") derived from sf0.1.

The driver's generator is not shipped (TESTDATA.md: read-only data), so
the probe derives sf1 deterministically from sf0.1 (seed structure
preserved):

- documents: 10 copies; copy k prefixes every whitespace token with
  `k<k>` — a bijection on word tokens, so WITHIN each copy the shingle
  overlap graph (near-dup structure, cluster sizes) is exactly sf0.1's,
  while ACROSS copies no shingles collide (no artificial mega-clusters,
  no hot shingles). 10x docs -> 10x clusters of unchanged size: the
  right shape for measuring growth factors.
- embeddings: 10 copies with seeded per-copy gaussian jitter (1e-3) so
  copies are distinct but the geometry is preserved. vec_ids offset by
  copy * 1_000_000 (queries/centroids vec_id < K live in copy 0 only).
- events: 10 copies; user/anonymous ids suffixed per copy so the
  identity graph is 10 disjoint copies of sf0.1's graph.

Usage: python tools/gen_scale_probe.py [out_dir]  (default
/tmp/spark_graft_sf1). Pure pandas/pyarrow — no Spark needed.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"
COPIES = 10
ID_OFFSET = 1_000_000


def _prefix_tokens(text: str, k: int) -> str:
    if k == 0:
        return text
    p = f"k{k}"
    return " ".join(p + tok for tok in text.split())


def gen_documents(out_dir: str) -> int:
    base = pd.read_parquet(os.path.join(SRC, "documents.parquet"))
    parts = []
    for k in range(COPIES):
        c = base.copy()
        c["doc_id"] = c["doc_id"] + k * ID_OFFSET
        if k:
            c["text"] = [_prefix_tokens(t, k) for t in c["text"]]
            c["n_chars"] = c["text"].str.len()
        parts.append(c)
    df = pd.concat(parts, ignore_index=True)
    df.to_parquet(os.path.join(out_dir, "documents.parquet"), index=False)
    return len(df)


def gen_embeddings(out_dir: str) -> int:
    base = pd.read_parquet(os.path.join(SRC, "embeddings.parquet"))
    mat = np.array(list(base["embedding"]), dtype=np.float32)
    parts = []
    for k in range(COPIES):
        c = base.copy()
        c["vec_id"] = c["vec_id"] + k * ID_OFFSET
        if k:
            rng = np.random.default_rng(42 + k)
            jit = mat + rng.normal(0, 1e-3, mat.shape).astype(np.float32)
            c["embedding"] = list(jit)
        parts.append(c)
    df = pd.concat(parts, ignore_index=True)
    df.to_parquet(os.path.join(out_dir, "embeddings.parquet"), index=False)
    return len(df)


def gen_events(out_dir: str) -> int:
    # events: (event_id BIGINT, ts, user_id BIGINT, event_type, value,
    # props) — offset the numeric ids per copy so the identity/user
    # graphs are 10 disjoint copies of sf0.1's
    base = pd.read_parquet(os.path.join(SRC, "events.parquet"))
    parts = []
    for k in range(COPIES):
        c = base.copy()
        if k:
            c["event_id"] = c["event_id"] + k * ID_OFFSET
            c["user_id"] = c["user_id"] + k * ID_OFFSET
        parts.append(c)
    df = pd.concat(parts, ignore_index=True)
    df.to_parquet(os.path.join(out_dir, "events.parquet"), index=False)
    return len(df)


def gen_tpch_facts(out_dir: str) -> tuple[int, int]:
    """orders + lineitem replicated 10x with per-copy orderkey offsets
    (round 9: the full-registry scale bench needs the relational
    q-family's growth to be real, not a 1x copy). Join structure is
    preserved: every copy's orders keep their original custkeys and
    every copy's lineitems their part/supp keys, so the dims stay 1x
    (they ARE dims) while the fact tables grow 10x — the standard
    fact-grows-dims-don't warehouse shape."""
    orders = pd.read_parquet(os.path.join(SRC, "orders.parquet"))
    lineitem = pd.read_parquet(os.path.join(SRC, "lineitem.parquet"))
    okey_off = int(orders["o_orderkey"].max()) + 1
    o_parts, l_parts = [], []
    for k in range(COPIES):
        o = orders.copy()
        li = lineitem.copy()
        if k:
            o["o_orderkey"] = o["o_orderkey"] + k * okey_off
            li["l_orderkey"] = li["l_orderkey"] + k * okey_off
        o_parts.append(o)
        l_parts.append(li)
    odf = pd.concat(o_parts, ignore_index=True)
    ldf = pd.concat(l_parts, ignore_index=True)
    odf.to_parquet(os.path.join(out_dir, "orders.parquet"), index=False)
    ldf.to_parquet(os.path.join(out_dir, "lineitem.parquet"), index=False)
    return len(odf), len(ldf)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    os.makedirs(out_dir, exist_ok=True)
    # dims copy verbatim so load_table finds every table it expects
    for t in "region nation customer supplier part".split():
        src = os.path.join(SRC, f"{t}.parquet")
        if os.path.exists(src):
            pd.read_parquet(src).to_parquet(
                os.path.join(out_dir, f"{t}.parquet"), index=False
            )
    n_ord, n_li = gen_tpch_facts(out_dir)
    n_docs = gen_documents(out_dir)
    n_emb = gen_embeddings(out_dir)
    n_ev = gen_events(out_dir)
    print(
        f"wrote {out_dir}: documents={n_docs} embeddings={n_emb} "
        f"events={n_ev} orders={n_ord} lineitem={n_li} (10x sf0.1)"
    )


if __name__ == "__main__":
    main()
