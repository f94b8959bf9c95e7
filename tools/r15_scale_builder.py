#!/usr/bin/env python
"""Round-15 scaled-data builder (VERDICT r14 #1): materialize an r×-replica
copy of sf0.1 covering EVERY table the round-14/15 touched queries read —
scaling_curve.build_scaled's four tables (documents, embeddings, orders,
lineitem — disjoint key spaces, replica-suffixed tokens) plus:

- ``supplier``: s_suppkey offset like lineitem's l_suppkey, s_acctbal
  copied (the bloom query's ~6% negative-balance selectivity holds per
  replica; orphan structure of the dq FK check is preserved per replica);
- ``events``: event_id/user_id offset, ts/value/type/props copied — the
  KS scan volume grows r× while the grouped value set stays fixed, which
  is exactly the scan-pass-count claim under test;
- ``customer``/``part``/``nation``/``region``: copied verbatim (dims some
  catalog queries join; not themselves under test here).

Usage: python tools/r15_scale_builder.py --replicas 6 [--out /tmp/festvibes_scale15]
Prints the built directory path.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.scaling_curve import build_scaled  # noqa: E402


def build_full(base: str, out_dir: str, r: int) -> str:
    import duckdb

    dst = os.path.join(out_dir, f"x{r}")
    if os.path.exists(os.path.join(dst, "_BUILT_FULL")):
        return dst
    build_scaled(base, out_dir, r)  # documents/embeddings/orders/lineitem
    con = duckdb.connect()
    reps = ", ".join(str(i) for i in range(r))
    K_SUPP, K_EV, K_USER = 10_000_000, 100_000_000, 10_000_000
    con.execute(
        f"""
        COPY (
          SELECT s.s_suppkey + rep.i * {K_SUPP} AS s_suppkey,
                 s.s_name, s.s_nationkey, s.s_acctbal
          FROM '{base}/supplier.parquet' s, (SELECT unnest([{reps}]) AS i) rep
        ) TO '{dst}/supplier.parquet' (FORMAT parquet)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT e.event_id + rep.i * {K_EV} AS event_id,
                 e.ts, e.user_id + rep.i * {K_USER} AS user_id,
                 e.event_type, e.value, e.props
          FROM '{base}/events.parquet' e, (SELECT unnest([{reps}]) AS i) rep
        ) TO '{dst}/events.parquet' (FORMAT parquet)
        """
    )
    con.close()
    for t in ("customer", "part", "nation", "region"):
        shutil.copy(f"{base}/{t}.parquet", f"{dst}/{t}.parquet")
    Path(dst, "_BUILT_FULL").touch()
    return dst


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/festvibes_scale15")
    ap.add_argument("--replicas", type=int, default=6)
    args = ap.parse_args()
    print(build_full(args.base, args.out, args.replicas))


if __name__ == "__main__":
    main()
