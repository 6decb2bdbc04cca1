"""Generate _LEDGER_PRIORITY in __spark_entry__.py from the driver
ledger + git history — the round-8 VERDICT's "stale-green class" fix.

The round driver samples 50 registry entries per round for its
correctness gate, taking the priority list as a prefix-weighted draw.
Hand-curated ordering rotted twice (r6: a registration missed the draw;
r8: three refactor-touched queries kept 2-round-old green rows). This
tool derives the order mechanically:

1. NEVER-LEDGERED queries first (no green driver row in any
   CORRECTNESS_r*.json) — new registrations, in registry order.
2. REFACTOR-TOUCHED next: queries whose registering module (or any
   posting_lines_spark file that module imports, one level) changed in
   git since the round of their last green row — their green rows
   certify code that no longer exists. Oldest-green-first.
3. Everything else, oldest-green-first (so decade-old r1/r2 rows
   continuously re-certify), registry order as the tiebreak.

The generated block records two of its three inputs (correctness files
+ the HEAD sha used as the git-diff base). The third input — the
registry name list and each query's implementing-file set — is ALWAYS
read from the current working tree, not the recorded sha (r10, ADVICE
item: resolving the registry at a past sha would need a checkout, and
pretending otherwise made --check's contract misleading). So --check
verifies: committed block == regeneration from (recorded ledgers,
recorded diff base, CURRENT tree). A registration added/renamed/removed
after the last --write therefore FAILS --check by design — that is the
drift the tool exists to catch; the fix is always to re-run --write.

Usage:
    python tools/ledger_priority.py --write   # regenerate the block
    python tools/ledger_priority.py --check   # exit 1 on drift
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "__spark_entry__.py")
BEGIN = "# === BEGIN GENERATED LEDGER PRIORITY (tools/ledger_priority.py) ==="
END = "# === END GENERATED LEDGER PRIORITY ==="


def _git(*args: str) -> str:
    return subprocess.check_output(
        ["git", *args], cwd=REPO, text=True, stderr=subprocess.DEVNULL
    )


def last_green_rounds(files: list[str]) -> dict[str, int]:
    """query -> highest round with a fully-green driver row."""
    out: dict[str, int] = {}
    for f in files:
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        for q, row in json.load(open(os.path.join(REPO, f))).items():
            green = (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            )
            if green:
                out[q] = max(out.get(q, 0), rnd)
    return out


def round_commits() -> dict[int, str]:
    """round -> sha of the driver's 'round N: verdict/...' commit (the
    code the round-N correctness rows certified is AT that commit —
    the verdict commit only adds artifact files on top of it)."""
    out: dict[int, str] = {}
    for line in _git("log", "--format=%H %s").splitlines():
        sha, _, subj = line.partition(" ")
        m = re.match(r"round (\d+): verdict/", subj)
        if m:
            out.setdefault(int(m.group(1)), sha)
    return out


_IMPORT_RE = re.compile(
    r"^\s*from\s+(posting_lines_spark(?:\.\w+)*)\s+import\s+(.+)$"
)


def query_files(names: list[str]) -> dict[str, set[str]]:
    """query -> {registering module + its one-level package imports}
    (repo-relative paths). Registration names are string literals, so
    the registering module is the queries/*.py file quoting the name."""
    qdir = os.path.join(REPO, "posting_lines_spark", "queries")
    sources = {}
    for p in sorted(glob.glob(os.path.join(qdir, "*.py"))):
        sources[os.path.relpath(p, REPO)] = open(p).read()

    def deps_of(rel: str) -> set[str]:
        out = {rel}
        for line in sources.get(rel, open(os.path.join(REPO, rel)).read()).splitlines():
            m = _IMPORT_RE.match(line)
            if not m:
                continue
            mod, items = m.group(1), m.group(2)
            base = mod.replace(".", "/")
            if os.path.exists(os.path.join(REPO, base + ".py")):
                out.add(base + ".py")
            for item in re.split(r"[,(]", items):
                item = item.strip().split(" ")[0]
                cand = f"{base}/{item}.py"
                if item and os.path.exists(os.path.join(REPO, cand)):
                    out.add(cand)
        return out

    out: dict[str, set[str]] = {}
    for q in names:
        needle = f'"{q}"'
        regs = [rel for rel, src in sources.items() if needle in src]
        files: set[str] = set()
        for rel in regs:
            files |= deps_of(rel)
        out[q] = files
    return out


def changed_since(base: str, head: str) -> set[str]:
    try:
        return set(_git("diff", "--name-only", base, head).splitlines())
    except subprocess.CalledProcessError:
        return set()


def generate(
    corr_files: list[str], head: str
) -> tuple[list[str], list[str], list[str]]:
    """Returns (never_ledgered, touched, rest) in final order."""
    sys.path.insert(0, REPO)
    from posting_lines_spark.queries import load_all

    names = list(load_all())
    order = {q: i for i, q in enumerate(names)}
    green = last_green_rounds(corr_files)
    rcommits = round_commits()
    qfiles = query_files(names)

    changed_cache: dict[int, set[str]] = {}

    def touched(q: str) -> bool:
        rnd = green[q]
        if rnd not in rcommits:
            return False
        if rnd not in changed_cache:
            changed_cache[rnd] = changed_since(rcommits[rnd], head)
        return bool(qfiles[q] & changed_cache[rnd])

    never = [q for q in names if q not in green]
    led = [q for q in names if q in green]
    touch = sorted(
        (q for q in led if touched(q)), key=lambda q: (green[q], order[q])
    )
    tset = set(touch)
    rest = sorted(
        (q for q in led if q not in tset), key=lambda q: (green[q], order[q])
    )
    return never, touch, rest


def render(corr_files: list[str], head: str) -> str:
    never, touch, rest = generate(corr_files, head)
    lines = [
        BEGIN,
        "# Derived order: (1) never-ledgered registrations, (2) queries whose",
        "# implementing files changed since their last green driver row",
        "# (stale-green — the row certifies code that no longer exists),",
        "# (3) the rest oldest-green-first. Regenerate with",
        "#   python tools/ledger_priority.py --write",
        f"# inputs: correctness={','.join(corr_files)}",
        f"# inputs: head={head} (git-diff base only; the registry and",
        "# implementing-file sets are read from the working tree, so any",
        "# registration change after --write fails --check by design)",
        "_LEDGER_PRIORITY = [",
        "    # -- never ledgered (new registrations; no driver row exists) --",
    ]
    for q in never:
        lines.append(f'    "{q}",')
    lines.append(
        "    # -- stale-green: implementing files changed since last row --"
    )
    for q in touch:
        lines.append(f'    "{q}",')
    lines.append("    # -- ledgered and unchanged, oldest green row first --")
    for q in rest:
        lines.append(f'    "{q}",')
    lines += ["]", END]
    return "\n".join(lines)


def current_inputs() -> tuple[list[str], str]:
    corr = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    )
    head = _git("rev-parse", "HEAD").strip()
    return corr, head


def recorded_inputs(text: str) -> tuple[list[str], str]:
    corr = re.search(r"# inputs: correctness=(\S+)", text).group(1).split(",")
    head = re.search(r"# inputs: head=(\S+)", text).group(1)
    return corr, head


def splice(text: str, block: str) -> str:
    i, j = text.index(BEGIN), text.index(END) + len(END)
    return text[:i] + block + text[j:]


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "--check"
    text = open(ENTRY).read()
    if mode == "--write":
        corr, head = current_inputs()
        open(ENTRY, "w").write(splice(text, render(corr, head)))
        print(f"wrote {ENTRY} (inputs: {len(corr)} ledgers, head {head[:9]})")
        return 0
    # --check: regenerate from the RECORDED inputs; drift = mismatch.
    corr, head = recorded_inputs(text)
    want = splice(text, render(corr, head))
    if want != text:
        print("ledger priority drift: regenerate with --write")
        return 1
    print("ledger priority up to date")
    return 0


if __name__ == "__main__":
    sys.exit(main())
