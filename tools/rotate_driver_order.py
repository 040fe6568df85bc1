"""Regenerate DRIVER_ORDER in registry.py from recorded driver evidence.

The driver hashes only the first 50 ``queries()`` entries per round, so
DRIVER_ORDER is a rotation queue: ops that still lack a driver-side
hash row must come first.  This tool derives that queue from the ONLY
authoritative inputs — the registry itself and the CORRECTNESS_r*.json
artifacts the driver wrote — instead of a hand-maintained name list
(round-3 ADVICE: the free-text TODO comment was the de-facto queue and
easy to corrupt during manual edits).

Policy (deterministic):
  1. PRIORITY ops first (explicit judge/advice callouts for the round).
  2. Oracled ops with no ``hash_match: true`` row in any
     CORRECTNESS_r*.json, round-robin across operator categories so a
     50-slot round samples every family instead of draining one module.
  3. Rows-only ops the driver has never executed, then rows-only ops
     it has (re-run them last).
  4. Already-hashed ops, oldest evidence round first (re-confirmation
     is the lowest-value slot).

Usage:  python tools/rotate_driver_order.py [--check]
  --check: verify registry.py is up to date (exit 1 if a rewrite would
  change it) without writing.
"""

from __future__ import annotations

import glob
import itertools
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Explicit per-round promotions (judge "Next round" items). Keep short;
# everything else is computed.
PRIORITY: list[str] = [
    # r10 (verdict item 1): no promotions — every slot goes to the
    # never-hashed drain so the r10 union reaches 429 + 50 = 479/503.
    # (The r9 sketch-op promotions all got their hash rows and are
    # back in the evidence-driven tiers.)
]


def evidence_files() -> list[str]:
    """COMMITTED CORRECTNESS_r*.json paths only (r6 verdict item 2).

    The driver writes CORRECTNESS_r{N}.json into the worktree AFTER the
    builder's last commit, so a glob-based queue changes between commit
    time and judging time — the sync guard then fails at every judging
    checkpoint by construction (sole pytest failure in rounds 5 and 6).
    Deriving the queue from ``git ls-files`` makes a tree that was
    committed green stay green when new untracked evidence lands; the
    next round's rotation (run after the driver commits that evidence)
    picks it up.  Falls back to glob if git is unavailable.
    """
    try:
        out = subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json"],
            capture_output=True, text=True, cwd=REPO, timeout=30, check=True,
        ).stdout
        return sorted(os.path.join(REPO, p) for p in out.split() if p)
    except (OSError, subprocess.SubprocessError):
        return sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))


def evidence() -> tuple[set[str], set[str], dict[str, int], dict[str, int]]:
    """(hashed, executed, first_round_seen, last_hash_round) from
    COMMITTED CORRECTNESS_r*.json. last_hash_round is the MOST RECENT
    round with a hash_match=true row — the staleness key for the
    re-confirmation tier (r11 verdict item 5: 75 ops were last
    driver-hashed in r01/r02; first_round can't see that, because an
    op hashed in r01 AND r11 sorts identically to one hashed only in
    r01)."""
    hashed: set[str] = set()
    executed: set[str] = set()
    first_round: dict[str, int] = {}
    last_hash: dict[str, int] = {}
    for path in evidence_files():
        m = re.search(r"_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            executed.add(name)
            first_round.setdefault(name, rnd)
            if row.get("hash_match") is True:
                hashed.add(name)
                last_hash[name] = max(last_hash.get(name, 0), rnd)
    return hashed, executed, first_round, last_hash


def build_order() -> list[str]:
    import insight_gp_import_spark.operators  # noqa: F401  side-effect imports

    from insight_gp_import_spark.registry import REGISTRY

    hashed, executed, first_round, last_hash = evidence()
    order: list[str] = []
    seen: set[str] = set()

    def emit(names: list[str]) -> None:
        for n in names:
            if n not in seen and n in REGISTRY:
                order.append(n)
                seen.add(n)

    emit(PRIORITY)

    # 2. never-hashed oracled, round-robin over categories (REGISTRY
    #    insertion order inside each category).
    pending = [
        o for o in REGISTRY.values()
        if o.oracle is not None and o.name not in hashed and o.name not in seen
    ]
    by_cat: dict[str, list[str]] = {}
    for o in pending:
        by_cat.setdefault(o.category or "misc", []).append(o.name)
    rr = [
        n
        for tier in itertools.zip_longest(*(by_cat[c] for c in sorted(by_cat)))
        for n in tier
        if n is not None
    ]
    emit(rr)

    # 3. rows-only: never driver-executed first, then by first round seen.
    rows_only = [o.name for o in REGISTRY.values() if o.oracle is None]
    emit([n for n in rows_only if n not in executed])
    emit(sorted((n for n in rows_only if n in executed),
                key=lambda n: (first_round.get(n, 99), n)))

    # 4. already-hashed, stalest driver evidence first (by the most
    #    recent hash round, not the first — see evidence()).
    emit(sorted((n for n in hashed if n in REGISTRY),
                key=lambda n: (last_hash.get(n, 99), n)))

    emit(list(REGISTRY))  # safety net: anything not yet placed
    assert len(order) == len(REGISTRY), (len(order), len(REGISTRY))
    return order


def rewrite(order: list[str], check: bool) -> int:
    path = os.path.join(REPO, "insight_gp_import_spark", "registry.py")
    with open(path) as f:
        src = f.read()
    lines = [f'    "{n}",' for n in order]
    block = "DRIVER_ORDER: list[str] = [\n" + "\n".join(lines) + "\n]"
    new_src, n_subs = re.subn(
        r"DRIVER_ORDER: list\[str\] = \[.*?\n\]", block, src, count=1, flags=re.S
    )
    if n_subs != 1:
        print("ERROR: DRIVER_ORDER block not found in registry.py")
        return 2
    if new_src == src:
        print("registry.py DRIVER_ORDER already up to date")
        return 0
    if check:
        print("STALE: registry.py DRIVER_ORDER differs from computed queue")
        # name the evidence files consumed (a freshly-landed
        # CORRECTNESS_r*.json is the usual cause of drift) and show the
        # first differing slots so the fix — re-run this tool — is obvious
        consumed = sorted(os.path.basename(p) for p in evidence_files())
        print(f"  evidence consumed: {', '.join(consumed) or '(none)'}")
        m = re.search(r"DRIVER_ORDER: list\[str\] = \[(.*?)\n\]", src, flags=re.S)
        committed = re.findall(r'"([^"]+)"', m.group(1)) if m else []
        diffs = [
            (i + 1, c, w)
            for i, (c, w) in enumerate(zip(committed, order))
            if c != w
        ][:5]
        for slot, have, want in diffs:
            print(f"  slot {slot}: committed={have} computed={want}")
        print("  fix: python tools/rotate_driver_order.py && git add/commit")
        return 1
    with open(path, "w") as f:
        f.write(new_src)
    print(f"rewrote DRIVER_ORDER ({len(order)} ops); first 50 slots:")
    for i, n in enumerate(order[:50], 1):
        print(f"  {i:2d}. {n}")
    return 0


if __name__ == "__main__":
    sys.exit(rewrite(build_order(), check="--check" in sys.argv))
