#!/usr/bin/env python
"""Standalone verifier for PUBLISHED query responses — no Spark import.

The reference ships its verifier as a standalone consumer component
(groth16-framework/src/verifier/, src/evm/executor.rs): anyone holding a
published response can check it WITHOUT the prover's stack. This tool is
that analog for the engine's published response artifacts: pure
Python + DuckDB over the served parquet
(.artifacts/q2_response_*.parquet / erc20_response_*.parquet), verifying

  1. leaf_ok    — each revealed row's leaf hash re-derives from its
                  claimed payload (token_id for q2;
                  event_id:entry_reward_hex for erc20),
  2. root_ok    — the opening path refolds from the leaf to the claimed
                  commitment root (side-tagged sha256 chain),
  3. binding_ok — the response's public inputs (min_block, max_block,
                  range_digest, and rewards_rate for erc20) match an
                  independent recompute over the raw events table.

INDEPENDENCE IS THE POINT: this file restates the response spec
(hash encodings, path wire format, provenance digest) from scratch
instead of importing euclid_spark — a verifier that shares the prover's
code would inherit the prover's bugs. The spec constants below are the
published query parameters a consumer knows because they asked the
query (the reference's public inputs, query2/revelation/public_inputs.rs).

Usage:
  python tools/verify_response.py <sf_dir> [--artifacts DIR]
                                  [--response PATH --kind q2|erc20]
Exit 0 iff every revealed row of every checked response verifies.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import duckdb

# ---- published query parameters (the public inputs) -------------------
T_MIN, T_MAX = "2024-01-05", "2024-01-25"  # queried block-range window
REWARDS_RATE = 7                           # erc20 rewards-rate input
DIGEST_PRIME = 1_000_000_007               # range-digest modulus
MIX = 2_654_435_761                        # range-digest row mix

_RANGE = f"ts >= TIMESTAMP '{T_MIN}' AND ts < TIMESTAMP '{T_MAX}'"

# provenance recompute over the raw corpus (events parquet): the block
# range actually covered + additive digest of the scanned rows
_PROV_SQL = f"""
    SELECT MIN(event_id) AS min_block, MAX(event_id) AS max_block,
           CAST(SUM((event_id * {MIX} + user_id * 97) % {DIGEST_PRIME})
                % {DIGEST_PRIME} AS BIGINT) AS range_digest
    FROM read_parquet('{{events}}') WHERE {_RANGE}
"""

# refold a leaf hash along its serialized opening path
# ("<level><side>:<hex>/..." levels ascending; side R = sibling on the
# right, L = left; empty path = single-leaf group, leaf IS the root)
_REFOLD = """list_reduce(
    list_prepend(r.leaf_hash,
                 list_filter(str_split(r.path, '/'), s -> s <> '')),
    (acc, s) -> CASE WHEN right(split_part(s, ':', 1), 1) = 'R'
                     THEN sha256(acc || split_part(s, ':', 2))
                     ELSE sha256(split_part(s, ':', 2) || acc) END)"""

_LEAF_ENCODING = {
    # q2 leaves commit the revealed mapping key
    "q2": "sha256(r.token_id::VARCHAR)",
    # erc20 leaves commit (entry, per-entry reward) — the computation trace
    "erc20": "sha256(r.event_id::VARCHAR || ':' || r.entry_reward_hex)",
}

_ID_COL = {"q2": "token_id", "erc20": "event_id"}


def _corpus_fingerprint(paths: list[str], **params: object) -> str:
    """Locate THIS corpus's published responses: md5 over each file's
    (path, size, mtime_ns) + sorted params — restated here (not
    imported) to keep the verifier prover-independent; the artifact
    NAMING convention is public surface, like a URL scheme."""
    import hashlib

    parts = [f"{k}={params[k]}" for k in sorted(params)]
    for path in paths:
        entries = (
            sorted(
                os.path.join(r, f)
                for r, _, fs in os.walk(path)
                for f in fs
                if not f.startswith(("_", "."))
            )
            if os.path.isdir(path)
            else [path]
        )
        for p in entries:
            st = os.stat(p)
            parts.append(f"{p}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()


def _discover(artifacts_dir: str, sf_dir: str) -> list[tuple[str, str]]:
    """This corpus's response artifacts by exact fingerprint; responses
    published from OTHER corpora are skipped (their binding check would
    fail by construction, which is the verifier doing its job but not
    what the default all-good/exit-0 contract should rest on)."""
    ev = f"{sf_dir}/events.parquet"
    out = []
    q2 = os.path.join(
        artifacts_dir,
        f"q2_response_{_corpus_fingerprint([ev], op='q2_response')}.parquet",
    )
    if os.path.exists(q2):
        out.append((q2, "q2"))
    fp = _corpus_fingerprint(
        [ev], op="erc20_entry_tree", v=2, rate=REWARDS_RATE,
        layout="owner_v2",
    )
    erc = os.path.join(artifacts_dir, f"erc20_response_{fp}.parquet")
    if os.path.exists(erc):
        out.append((erc, "erc20"))
    return out


def verify(response_path: str, kind: str, events_path: str) -> dict:
    """Verify one published response parquet; returns the verdict dict."""
    if kind not in _LEAF_ENCODING:
        raise SystemExit(f"unknown response kind {kind!r} (q2|erc20)")
    binding = [
        "r.min_block = p.min_block",
        "r.max_block = p.max_block",
        "r.range_digest = p.range_digest",
    ]
    if kind == "erc20":
        binding.append(f"r.rewards_rate = {REWARDS_RATE}")
    idc = _ID_COL[kind]
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT {idc}, leaf_ok, root_ok, binding_ok,
               (leaf_ok AND root_ok AND binding_ok) AS valid
        FROM (
          SELECT r.{idc},
                 ({_LEAF_ENCODING[kind]} = r.leaf_hash) AS leaf_ok,
                 ({_REFOLD} = r.root) AS root_ok,
                 ({' AND '.join(binding)}) AS binding_ok
          FROM read_parquet('{response_path}/*.parquet') r
          CROSS JOIN ({_PROV_SQL.format(events=events_path)}) p
        )
        ORDER BY {idc}
        """
    ).fetchall()
    n = len(rows)
    fails = {
        "leaf_ok": [r[0] for r in rows if not r[1]],
        "root_ok": [r[0] for r in rows if not r[2]],
        "binding_ok": [r[0] for r in rows if not r[3]],
    }
    return {
        "response": response_path,
        "kind": kind,
        "rows": n,
        "valid_rows": sum(1 for r in rows if r[4]),
        "failed": {k: v[:5] for k, v in fails.items() if v},
        "verdict": "VALID"
        if n > 0 and all(r[4] for r in rows)
        else ("EMPTY" if n == 0 else "INVALID"),
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir", help="corpus dir holding events.parquet")
    ap.add_argument(
        "--artifacts",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".artifacts",
        ),
    )
    ap.add_argument("--response", help="explicit response parquet dir")
    ap.add_argument("--kind", choices=["q2", "erc20"])
    args = ap.parse_args()
    events = os.path.join(args.sf_dir, "events.parquet")
    if not os.path.exists(events):
        raise SystemExit(f"no events table at {events}")

    targets: list[tuple[str, str]] = []
    if args.response:
        if not args.kind:
            raise SystemExit("--response requires --kind")
        targets.append((args.response, args.kind))
    else:
        targets = _discover(args.artifacts, args.sf_dir)
    if not targets:
        n_any = len(
            glob.glob(os.path.join(args.artifacts, "*_response_*.parquet"))
        )
        raise SystemExit(
            f"no published responses for corpus {args.sf_dir} under "
            f"{args.artifacts} ({n_any} responses from other corpora "
            "present; run the euclid_verifiable_response / "
            "euclid_erc20_verifiable_response queries on this corpus, "
            "or pass --response/--kind explicitly)"
        )

    ok = True
    for path, kind in targets:
        v = verify(path, kind, events)
        print(json.dumps(v, separators=(",", ":")))
        ok = ok and v["verdict"] == "VALID"
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
