"""Generate the driver-evidence rotation slice from the CORRECTNESS record.

The driver's correctness sweep truncates to the FIRST 50 registered catalog
names, so each round must rewrite ``plans/catalog.py:_PRIORITY`` to aim the
evidence budget at the names that need it. Round 9 skipped that rewrite and
re-proved round 8's slice verbatim — an entire round of driver evidence
wasted (VERDICT r9 "what's wrong" #1). This tool makes the standing policy
EXECUTABLE instead of intentional:

    python tools/rotation.py                 # print the recommended slice
    python tools/rotation.py --write         # rewrite _PRIORITY in place
    python tools/rotation.py --lead a,b,c    # force names to the front
                                             # (impl/oracle changed this
                                             # round — not derivable from
                                             # the artifacts, so caller-
                                             # supplied)

Ordering (the policy encoded in catalog.py's comment):
  1. RED rows in the latest CORRECTNESS artifact (any check false / err);
  2. ``--lead`` names (implementation or oracle changed this round);
  3. names with NO driver row in any CORRECTNESS_r*.json (new queries);
  4. everything else by STALENESS — oldest latest-evidence round first,
     catalog registration order as the tie-break — filling to 50.

``--write`` replaces the literal tuple between the ``_PRIORITY = (`` line
and its closing ``)`` and refuses to write a slice that drops a red or
never-checked name. Run the pre-round byte-exact gate afterwards:
``python tools/compare_oracle.py --exact --jobs 4 --sf /root/testdata/sf0.01 $(python tools/rotation.py --names-only)``
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SLICE = 50


def evidence(repo: str) -> tuple[dict[str, int], set[str]]:
    """(latest evidence round per name, names red in the LATEST artifact)."""
    latest: dict[str, int] = {}
    files = sorted(
        glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")),
        key=lambda f: int(re.search(r"_r(\d+)", f).group(1)),
    )
    red: set[str] = set()
    for f in files:
        rnd = int(re.search(r"_r(\d+)", f).group(1))
        with open(f) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            latest[name] = rnd
        # red set reflects only the newest artifact (older reds were
        # either fixed and re-proven, or they resurface as stale anyway).
        # A rows-only query records err="no_oracle" with spark_rows
        # populated — that is its CLEAN state, not a failure.
        if f == files[-1]:
            red = {
                n
                for n, r in rows.items()
                if (r.get("err") not in (None, "no_oracle"))
                or (r.get("err") == "no_oracle" and r.get("spark_rows") is None)
                or any(
                    r.get(k) is False
                    for k in ("rows_match", "schema_match", "hash_match")
                )
            }
    return latest, red


def build_slice(
    repo: str, lead: list[str], defer_newest: bool = False
) -> tuple[list[str], dict]:
    sys.path.insert(0, repo)
    from sec_dl_spark.plans.catalog import REGISTRY, load_all

    load_all()
    # registration order WITHOUT the current _PRIORITY reordering is not
    # recoverable from load_all(); REGISTRY insertion order after import
    # is close enough for the tie-break (it is load_all's own output).
    names = list(REGISTRY)
    latest, red = evidence(repo)

    unknown = [n for n in lead if n not in names]
    if unknown:
        raise SystemExit(f"--lead names not in catalog: {unknown}")

    never = [n for n in names if n not in latest]
    red_now = [n for n in names if n in red]
    rest = sorted(
        (n for n in names if n in latest and n not in red),
        key=lambda n: (latest[n], names.index(n)),
    )

    out: list[str] = []
    for block in (red_now, lead, never, rest):
        for n in block:
            if n not in out:
                out.append(n)
    out = out[:SLICE]

    must = set(red_now) | set(never) | set(lead)
    dropped = must - set(out)
    if dropped and not defer_newest:
        raise SystemExit(
            f"slice of {SLICE} cannot hold all red/new/lead names; dropped: "
            f"{sorted(dropped)} — split across rounds deliberately: rerun "
            "with --defer-newest to push the NEWEST registrations (freshest "
            "non-driver evidence) to the next round's slice head"
        )
    if dropped:
        # deliberate split: the names dropped are exactly the newest
        # never-checked registrations (never-block order == registration
        # order, and the overflow falls off the tail). Red/lead names
        # must still fit — those are non-negotiable.
        hard = (set(red_now) | set(lead)) - set(out)
        if hard:
            raise SystemExit(
                f"red/lead names do not fit even with --defer-newest: "
                f"{sorted(hard)} — shrink --lead"
            )
        # stderr, NOT stdout: --names-only output gets spliced into shell
        # commands via $(...), and a comment line would word-split into
        # bogus query-name arguments
        print(
            f"# deferred to next round's slice head (never-checked overflow): "
            f"{sorted(dropped)}",
            file=sys.stderr,
        )
    info = {
        "red": red_now,
        "lead": lead,
        "never_checked": never,
        "stalest_round_in_slice": min(
            (latest[n] for n in out if n in latest), default=None
        ),
        "catalog_size": len(names),
    }
    return out, info


def _wrap_comment(text: str, width: int = 72) -> list[str]:
    """Wrap prose into '# '-prefixed lines."""
    out: list[str] = []
    line = "#"
    for word in text.split():
        if len(line) + 1 + len(word) > width and line != "#":
            out.append(line)
            line = "#"
        line += " " + word
    if line != "#":
        out.append(line)
    return out


def provenance_comment(repo: str, slice_names: list[str], info: dict) -> str:
    """The generated slice-description block (VERDICT r13 ask #6: the
    rotation tool itself keeps this comment fresh — a hand-written
    narrative went stale for three rounds)."""
    latest, _ = evidence(repo)
    next_round = max(
        (
            int(re.search(r"_r(\d+)", f).group(1))
            for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
        ),
        default=0,
    ) + 1
    n_lead = len(info["lead"])
    n_red = len(info["red"])
    never_in = [n for n in info["never_checked"] if n in slice_names]
    stale = [n for n in slice_names if n in latest and n not in info["lead"]]
    rounds = sorted({latest[n] for n in stale})
    parts = [
        f"Slice aimed at driver round r{next_round} "
        f"(catalog {info['catalog_size']} queries):"
    ]
    if n_red:
        parts.append(f"{n_red} RED rows lead ({', '.join(info['red'])});")
    if n_lead:
        parts.append(
            f"{n_lead} impl/oracle-changed lead names "
            f"({', '.join(info['lead'])});"
        )
    if never_in:
        parts.append(
            f"{len(never_in)} never-driver-checked "
            f"({', '.join(never_in[:6])}{', ...' if len(never_in) > 6 else ''});"
        )
    if stale:
        parts.append(
            f"then {len(stale)} stale fills, oldest evidence first "
            f"(rounds r{rounds[0]}..r{rounds[-1]})."
        )
    lines = [
        "# --- slice provenance (regenerated by `tools/rotation.py "
        "--write`;",
        "#     do not edit by hand — see NOTES.md for the round narrative) "
        "---",
        *_wrap_comment(" ".join(parts)),
        "# --- end slice provenance ---",
    ]
    return "\n".join(lines) + "\n"


def write_slice(repo: str, slice_names: list[str], info: dict) -> None:
    path = os.path.join(repo, "sec_dl_spark", "plans", "catalog.py")
    with open(path) as f:
        src = f.read()
    m = re.search(r"_PRIORITY = \(\n(?:.*?\n)*?\)\n", src)
    if not m:
        raise SystemExit("could not locate the _PRIORITY tuple in catalog.py")
    body = "".join(f'    "{n}",\n' for n in slice_names)
    src = src[: m.start()] + f"_PRIORITY = (\n{body})\n" + src[m.end() :]
    cm = re.search(
        r"# --- slice provenance \(regenerated.*?# --- end slice provenance ---\n",
        src,
        re.DOTALL,
    )
    if cm:
        src = (
            src[: cm.start()]
            + provenance_comment(repo, slice_names, info)
            + src[cm.end() :]
        )
    with open(path, "w") as f:
        f.write(src)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=REPO)
    ap.add_argument("--lead", default="", help="comma-separated impl-changed names")
    ap.add_argument("--write", action="store_true", help="rewrite _PRIORITY in place")
    ap.add_argument(
        "--names-only", action="store_true", help="print space-separated names only"
    )
    ap.add_argument(
        "--defer-newest",
        action="store_true",
        help="when red+lead+never-checked exceed the slice, defer the newest "
        "never-checked registrations to the next round instead of refusing",
    )
    args = ap.parse_args()
    lead = [n for n in args.lead.split(",") if n]
    slice_names, info = build_slice(args.repo, lead, args.defer_newest)
    if args.names_only:
        print(" ".join(slice_names))
        return
    print(json.dumps(info, indent=1))
    for i, n in enumerate(slice_names):
        print(f"{i + 1:3d} {n}")
    if args.write:
        write_slice(args.repo, slice_names, info)
        print("# _PRIORITY rewritten — rerun the pin test and the --exact gate")


if __name__ == "__main__":
    main()
