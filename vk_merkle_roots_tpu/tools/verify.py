"""``vkmr-verify`` — check a Merkle authentication path produced by
``vkmr --proof``.

The reference leaves proofs as an unimplemented to-do; this tool closes the
round trip: feed it the proof JSON (the exact object the CLI prints) and the
leaf bytes, and it recomputes leaf ``SHA256d`` then folds the path with the
interior-node rule (SHA-256plus.cpp:360-451 semantics) to compare against
the recorded root.

Usage::

    vkmr --proof 7 ... > proof.json          # proof JSON is the last line
    vkmr-verify proof.json < leaf_bytes      # leaf on stdin, or --leaf-hex

Exit code 0 and ``OK <root>`` on a valid path; 1 and a diagnostic otherwise.
"""

from __future__ import annotations

import argparse
import json
import sys

from .. import oracle


def verify_proof_json(record: dict, leaf: bytes) -> tuple[bool, str]:
    """(valid, computed_root_hex) for a ``--proof`` JSON record."""
    path = [(bytes.fromhex(p["sibling"]), p["side"]) for p in record["path"]]
    computed = oracle.verify_proof(oracle.leaf_hash(leaf), path)
    return computed.hex() == record["root"], computed.hex()


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="vkmr-verify", description=__doc__)
    parser.add_argument("proof", help="path to the proof JSON emitted by vkmr --proof")
    parser.add_argument(
        "--leaf-hex", default=None, help="leaf bytes as hex (default: raw leaf on stdin)"
    )
    args = parser.parse_args(argv)

    with open(args.proof) as fh:
        text = fh.read().strip()
    # Accept either the bare JSON object or full vkmr stdout (object last).
    leaf = bytes.fromhex(args.leaf_hex) if args.leaf_hex else sys.stdin.buffer.read()
    try:
        record = json.loads(text.splitlines()[-1] if text else "")
        ok, computed = verify_proof_json(record, leaf)
    except (json.JSONDecodeError, KeyError, TypeError, ValueError) as exc:
        # e.g. --proof errored upstream and only the summary line was
        # captured: one clean diagnostic, not a traceback.
        print(f"not a proof record: {args.proof} ({exc})", file=sys.stderr)
        return 1
    if ok:
        print(f"OK {computed}")
        return 0
    print(
        f"MISMATCH: path folds to {computed}, proof claims {record['root']}",
        file=sys.stderr,
    )
    return 1


if __name__ == "__main__":
    sys.exit(main())
