"""Per-key source-hash sidecar for staleness-aware coverage ordering.

Problem (r3 verdict, "What's wrong" #2): the driver's official
CORRECTNESS record for a key certifies the code *as of the round that
recorded it*.  When an implementation is rewritten later (e.g.
``join_asof``: recorded green in r01, rewritten pure-JVM in r02), the
green row silently goes stale — nothing re-queues the key for official
re-verification.  This module makes staleness structural instead of
luck-of-the-window:

- ``current_hashes(specs)`` — per-key *function-closure* hash
  (per-key since r8; the r7 module-closure granularity meant adding one
  aggregate re-staled all 20 keys in ``aggregates.py`` — 159 of 209 keys
  entered r8 "stale" though almost none had behavior changes).  The hash
  covers: the ``@query`` function's own source INCLUDING its decorator
  (the oracle SQL lives there), the transitive closure of same-module
  top-level names it references (helpers, constants, classes), the
  source of import statements binding referenced external names, and —
  for referenced names bound by package-internal imports — the imported
  module's whole-file closure hash (cross-module deps stay module-level
  on purpose: rewriting ``sources/table_store.py`` changes every
  ``operators/ddl.py`` key's behavior without touching ddl.py; a key's
  verified behavior is the code it RUNS, not the file it is defined in).
  Keys not statically locatable fall back to the module-closure hash.
- ``tools/source_hashes.json`` stores, per key, ``{round: hash}`` —
  the hash of the key's source at the end of each builder round N, i.e.
  the exact code state the driver verifies when it writes
  ``CORRECTNESS_r{N}.json``.
- ``snapshot(root, round)`` — run as the LAST step of a builder round
  (before the final commit): stamps every key's current hash under the
  upcoming record round.  ``tools/coverage_order.py`` then compares a
  key's latest-record-round hash against the current hash at ordering
  time; a mismatch (or a record from a pre-sidecar round with no stored
  hash) demotes the key into the needs-re-record tier.

CLI:
    python -m tools.source_hashes snapshot --round N   # end of round N-1,
                                                       # expecting record rN
    python -m tools.source_hashes bootstrap            # one-time: stamp the
        # newest CORRECTNESS round's keys with current hashes (valid ONLY
        # when run on the exact commit that round verified)
    python -m tools.source_hashes backfill             # recompute EVERY
        # recorded (round, key) stamp from git: round N's record verified
        # the tree at the parent of the "round N: verdict" commit (the
        # driver auto-commits stragglers as the end-of-round snapshot just
        # before verifying), so hashes taken there are authoritative even
        # when the in-round stamp predated late edits
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys
from typing import Mapping

SIDECAR = "tools/source_hashes.json"


_PKG = "hivekudu_handler_spark"


def _pkg_imports(data: bytes) -> set[str]:
    """Dotted package-internal module names referenced by import
    statements in ``data`` (module- or function-level).  ``from X import
    a, b`` also yields ``X.a``/``X.b`` so submodule-from-package imports
    (``from pkg import typesys``) resolve; non-module names simply fail
    to resolve to a file and drop out."""
    import re

    text = data.decode("utf-8", "replace")
    deps: set[str] = set()
    for m in re.finditer(
        rf"from\s+({_PKG}(?:\.\w+)*)\s+import\s+(\(([^)]*)\)|[^\n]+)",
        text,
    ):
        mod = m.group(1)
        names = m.group(3) if m.group(3) is not None else m.group(2)
        deps.add(mod)
        for tok in re.split(r"[,\s]+", names):
            if tok.isidentifier() and tok != "as":
                deps.add(f"{mod}.{tok}")
    for m in re.finditer(rf"^\s*import\s+({_PKG}(?:\.\w+)*)", text, re.M):
        deps.add(m.group(1))
    return deps


def _combined_hash(entry_rel: str, read_bytes) -> str | None:
    """sha256 over the entry module PLUS the transitive closure of its
    package-internal imports (sorted (path, content-hash) pairs).

    Rationale (r7): hashing only the defining module left a dependency
    blind spot — rewriting ``sources/table_store.py`` changed the
    behavior of every ``operators/ddl.py`` key without staling a single
    one of their green records.  A key's verified behavior is the code
    it RUNS, not the file it is DEFINED in.  ``read_bytes(rel_path)``
    abstracts the tree (filesystem for current state, git blobs for
    backfill) so both sides of the staleness comparison use the same
    algorithm."""
    # the registration hub's load_all() imports EVERY query module, so
    # expanding its imports would collapse the closure to "the whole
    # package" and one global hash (every edit stales every key).  Its
    # own bytes still count; its imports don't propagate.
    no_expand = {f"{_PKG}/registry.py"}
    entry = read_bytes(entry_rel)
    if entry is None:
        return None
    seen: dict[str, bytes] = {entry_rel: entry}
    stack = [] if entry_rel in no_expand else [entry]
    while stack:
        blob = stack.pop()
        for dotted in _pkg_imports(blob):
            rel = dotted.replace(".", "/")
            for cand in (rel + ".py", rel + "/__init__.py"):
                if cand in seen:
                    break
                data = read_bytes(cand)
                if data is not None:
                    seen[cand] = data
                    if cand not in no_expand:
                        stack.append(data)
                    break
    agg = hashlib.sha256()
    for path in sorted(seen):
        agg.update(path.encode())
        agg.update(hashlib.sha256(seen[path]).digest())
    return agg.hexdigest()


class _ClosureWalker:
    """Cross-module, per-name source-closure hashing over raw source text.

    Static (AST, no imports) on purpose: the same algorithm must run
    against live files AND historical git blobs (``backfill``).  The
    closure of a top-level name is: its own source segment, plus (
    transitively) the segments of every top-level name it references —
    following ``from pkg.mod import name`` edges into OTHER package
    modules at the same per-name granularity.  Only when a reference is
    a whole-module import (``import pkg.m`` / ``from pkg import m``) or
    the name can't be found in the target module does it fall back to
    that module's whole-file closure hash.  This keeps hub modules
    (``registry.py``, ``tables.py``) from staling every key in the repo
    when one unrelated line is added (r7 verdict: 159/209 keys stale,
    almost all collateral)."""

    def __init__(self, read_bytes, follow_fn_imports: bool = True):
        # follow_fn_imports (landed r18 behind a flag, DEFAULT ON since
        # r19): the walker historically followed MODULE-level imports
        # only, so a key binding its dependency inside the function body
        # (`def key(): from pkg.sources.sql_ddl import sql; ...` — most
        # sql_* scenario keys) did not include that module in its
        # closure: r18's split_statements/_split_keyword/_merge edits
        # staled ZERO keys despite changing behavior those keys
        # exercise.  ON walks Import/ImportFrom nodes inside each def
        # body with the same per-name/module-hash rules as module-level
        # imports.  The r19 flip restamped ALL historical records via
        # ``backfill`` (same algorithm on both sides of the staleness
        # comparison), so post-flip staleness = genuine drift since each
        # record's round, not the mechanical hash change of the flip
        # itself.  ``follow_fn_imports=False`` remains available for the
        # historical-algorithm pin in tests/test_coverage_order.py.
        self.read = read_bytes
        self.follow_fn_imports = follow_fn_imports
        self._mods: dict[str, dict | None] = {}
        self._mod_hash: dict[str, str | None] = {}

    # -- module parsing ------------------------------------------------
    def info(self, rel: str) -> dict | None:
        """Parsed-module cache: {binds, segment(), tree} or None."""
        import ast

        if rel in self._mods:
            return self._mods[rel]
        data = self.read(rel)
        if data is None:
            self._mods[rel] = None
            return None
        text = data.decode("utf-8", "replace")
        try:
            tree = ast.parse(text)
        except SyntaxError:
            self._mods[rel] = None
            return None
        lines = text.splitlines(keepends=True)

        def segment(node) -> str:
            start = node.lineno
            decos = getattr(node, "decorator_list", None)
            if decos:
                # decorator source is part of a key's behavior (the
                # oracle SQL string lives inside the @query(...) call)
                start = min(start, min(d.lineno for d in decos))
            return "".join(lines[start - 1 : node.end_lineno])

        binds: dict[str, tuple] = {}
        for stmt in tree.body:
            if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                binds[stmt.name] = ("def", stmt)
            elif isinstance(stmt, (ast.Assign, ast.AnnAssign)):
                targets = stmt.targets if isinstance(stmt, ast.Assign) else [stmt.target]
                for t in targets:
                    for n in ast.walk(t):
                        if isinstance(n, ast.Name):
                            binds[n.id] = ("def", stmt)
            elif isinstance(stmt, ast.Import):
                for a in stmt.names:
                    binds[a.asname or a.name.split(".")[0]] = ("import", a.name, None, stmt)
            elif isinstance(stmt, ast.ImportFrom):
                mod = stmt.module or ""
                for a in stmt.names:
                    binds[a.asname or a.name] = ("import", mod, a.name, stmt)
        self._mods[rel] = {"binds": binds, "segment": segment, "tree": tree}
        return self._mods[rel]

    @staticmethod
    def _module_rel(dotted: str) -> list[str]:
        rel = dotted.replace(".", "/")
        return [rel + ".py", rel + "/__init__.py"]

    def module_hash(self, dotted: str) -> str | None:
        if dotted not in self._mod_hash:
            h = None
            for p in self._module_rel(dotted):
                h = _combined_hash(p, self.read)
                if h is not None:
                    break
            self._mod_hash[dotted] = h
        return self._mod_hash[dotted]

    def _follow_from_import(self, mod, attr, stack, mod_deps) -> None:
        """``from pkg.mod import attr`` — recurse per-name when the
        target module defines ``attr`` at top level, else fall back to
        the module-closure hash (submodule or dynamically-defined)."""
        for cand in self._module_rel(mod):
            tinfo = self.info(cand)
            if tinfo is None:
                continue
            tb = tinfo["binds"].get(attr)
            if tb is not None and tb[0] == "def":
                stack.append((cand, attr))
            else:
                h = self.module_hash(f"{mod}.{attr}") or self.module_hash(mod)
                if h is not None:
                    mod_deps[f"{mod}.{attr}"] = h
            break
        else:
            h = self.module_hash(f"{mod}.{attr}") or self.module_hash(mod)
            if h is not None:
                mod_deps[f"{mod}.{attr}"] = h

    # -- closure -------------------------------------------------------
    def closure_hash(self, rel: str, name: str) -> str | None:
        """Hash of the cross-module source closure of top-level ``name``
        in module ``rel``; None when the name can't be located."""
        import ast

        info = self.info(rel)
        if info is None or name not in info["binds"] or info["binds"][name][0] != "def":
            return None
        segs: dict[tuple[str, str], str] = {}
        mod_deps: dict[str, str] = {}
        imp_segs: dict[tuple[str, str], str] = {}
        stack = [(rel, name)]
        visited: set[tuple[str, str]] = set()
        while stack:
            mrel, mname = stack.pop()
            if (mrel, mname) in visited:
                continue
            visited.add((mrel, mname))
            minfo = self.info(mrel)
            if minfo is None:
                continue
            bound = minfo["binds"].get(mname)
            if bound is None:
                continue  # builtin / dynamically-defined: ignore
            if bound[0] == "def":
                node = bound[1]
                segs[(mrel, mname)] = minfo["segment"](node)
                for n in ast.walk(node):
                    if isinstance(n, ast.Name):
                        stack.append((mrel, n.id))
                    elif self.follow_fn_imports and isinstance(
                        n, ast.ImportFrom
                    ):
                        # function-level `from pkg.mod import name`: the
                        # statement text is already inside this def's
                        # segment (external imports need nothing more);
                        # package-internal targets recurse exactly like
                        # module-level import bindings
                        fmod = n.module or ""
                        if fmod.startswith(_PKG):
                            for a in n.names:
                                self._follow_from_import(
                                    fmod, a.name, stack, mod_deps
                                )
                    elif self.follow_fn_imports and isinstance(n, ast.Import):
                        for a in n.names:
                            if a.name.startswith(_PKG):
                                h = self.module_hash(a.name)
                                if h is not None:
                                    mod_deps[a.name] = h
                continue
            # import binding
            _, mod, attr, imp_stmt = bound
            if attr is not None and mod.startswith(_PKG):
                self._follow_from_import(mod, attr, stack, mod_deps)
            elif attr is None and mod.startswith(_PKG):
                # whole-module import: which attrs are used is not
                # statically tracked — whole-module hash
                h = self.module_hash(mod)
                if h is not None:
                    mod_deps[mod] = h
            else:
                # external import: pin the import statement's text
                imp_segs[(mrel, mname)] = minfo["segment"](imp_stmt)
        agg = hashlib.sha256()
        for k in sorted(segs):
            agg.update(f"{k[0]}:{k[1]}".encode())
            agg.update(hashlib.sha256(segs[k].encode()).digest())
        for k in sorted(mod_deps):
            agg.update(k.encode())
            agg.update(mod_deps[k].encode())
        for k in sorted(imp_segs):
            agg.update(f"imp:{k[0]}:{k[1]}".encode())
            agg.update(hashlib.sha256(imp_segs[k].encode()).digest())
        return agg.hexdigest()

    def query_keys(self, rel: str) -> dict[str, str]:
        """{key: top-level fn name} for every ``@query``-decorated
        function in the module at ``rel``."""
        import ast

        info = self.info(rel)
        if info is None:
            return {}
        out: dict[str, str] = {}
        for stmt in info["tree"].body:
            if not isinstance(stmt, ast.FunctionDef):
                continue
            for d in stmt.decorator_list:
                if isinstance(d, ast.Call):
                    f = d.func
                    dn = f.id if isinstance(f, ast.Name) else getattr(f, "attr", "")
                    if dn == "query" and d.args and isinstance(d.args[0], ast.Constant) \
                            and isinstance(d.args[0].value, str):
                        out[d.args[0].value] = stmt.name
        return out


def _fn_closure_hashes(entry_rel: str, read_bytes, walker: "_ClosureWalker | None" = None) -> dict[str, str]:
    """Per-key function-closure hashes for every ``@query``-registered
    top-level function in the module at ``entry_rel``.  Returns {} when
    the module can't be read/parsed (callers fall back to
    ``_combined_hash``)."""
    w = walker or _ClosureWalker(read_bytes)
    out: dict[str, str] = {}
    for key, fn_name in w.query_keys(entry_rel).items():
        h = w.closure_hash(entry_rel, fn_name)
        if h is not None:
            out[key] = h
    return out


def _fs_reader(root: str):
    cache: dict[str, bytes | None] = {}

    def read(rel: str) -> bytes | None:
        if rel not in cache:
            try:
                with open(os.path.join(root, rel), "rb") as f:
                    cache[rel] = f.read()
            except OSError:
                cache[rel] = None
        return cache[rel]

    return read


def current_hashes(specs: Mapping[str, object]) -> dict[str, str]:
    """Per-key function-closure hash (see ``_fn_closure_hashes``) from
    the live filesystem; falls back to the defining module's closure
    hash for keys not statically locatable."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    read = _fs_reader(root)
    walker = _ClosureWalker(read)
    fn_cache: dict[str, dict[str, str]] = {}
    mod_cache: dict[str, str] = {}
    rels: dict[str, str] = {}
    out: dict[str, str] = {}
    for name, spec in specs.items():
        mod = spec.fn.__module__
        if mod not in fn_cache:
            src = inspect.getsourcefile(sys.modules[mod])
            rels[mod] = os.path.relpath(os.path.abspath(src), root)
            fn_cache[mod] = _fn_closure_hashes(rels[mod], read, walker)
        if name in fn_cache[mod]:
            out[name] = fn_cache[mod][name]
        else:
            if mod not in mod_cache:
                mod_cache[mod] = _combined_hash(rels[mod], read)
            out[name] = mod_cache[mod]
    return out


def load_sidecar(root: str) -> dict[str, dict[str, str]]:
    """{key: {round_str: hash}} or {} when the sidecar doesn't exist."""
    path = os.path.join(root, SIDECAR)
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return {}
    hashes = data.get("hashes")
    return hashes if isinstance(hashes, dict) else {}


def save_sidecar(root: str, hashes: dict[str, dict[str, str]]) -> None:
    path = os.path.join(root, SIDECAR)
    with open(path, "w") as f:
        json.dump({"hashes": hashes}, f, indent=1, sort_keys=True)
        f.write("\n")


def stamp(root: str, round_no: int) -> int:
    """Record every registry key's current hash under ``round_no``."""
    from hivekudu_handler_spark.registry import load_all

    specs = load_all()
    cur = current_hashes(specs)
    hashes = load_sidecar(root)
    for key, h in cur.items():
        hashes.setdefault(key, {})[str(round_no)] = h
    save_sidecar(root, hashes)
    return len(cur)


def _verified_commits(root: str) -> dict[int, str]:
    """{round: commit} whose tree each round's CORRECTNESS record verified.

    The driver commits any uncommitted work ("round N: end-of-round
    snapshot"), runs verify, then lands artifacts as "round N: verdict/...".
    So the verified tree is the PARENT of each verdict commit — robust even
    for rounds with no snapshot commit.
    """
    import subprocess

    log = subprocess.run(
        ["git", "log", "--format=%H %s"],
        cwd=root, capture_output=True, text=True, check=True,
    ).stdout
    out: dict[int, str] = {}
    import re as _re

    for line in log.splitlines():
        sha, _, subject = line.partition(" ")
        m = _re.match(r"round (\d+): verdict", subject)
        if m:
            out[int(m.group(1))] = sha + "^"
    return out


def _module_paths(root: str, specs: Mapping[str, object]) -> dict[str, str]:
    """key -> repo-relative path of its defining module's source file."""
    out: dict[str, str] = {}
    for name, spec in specs.items():
        src = inspect.getsourcefile(sys.modules[spec.fn.__module__])
        out[name] = os.path.relpath(os.path.abspath(src), root)
    return out


def backfill(root: str) -> int:
    """Restamp every recorded (round, key) pair from the verified commit."""
    import subprocess

    from hivekudu_handler_spark.registry import load_all
    from tools.coverage_order import load_correctness_records

    specs = load_all()
    paths = _module_paths(root, specs)
    commits = _verified_commits(root)
    hashes = load_sidecar(root)
    blob_cache: dict[tuple[str, str], bytes | None] = {}
    combined_cache: dict[tuple[str, str], str | None] = {}

    def reader(commit: str):
        def read(rel: str) -> bytes | None:
            if (commit, rel) not in blob_cache:
                proc = subprocess.run(
                    ["git", "show", f"{commit}:{rel}"],
                    cwd=root, capture_output=True,
                )
                blob_cache[(commit, rel)] = (
                    proc.stdout if proc.returncode == 0 else None
                )
            return blob_cache[(commit, rel)]

        return read

    def combined(commit: str, path: str) -> str | None:
        if (commit, path) not in combined_cache:
            combined_cache[(commit, path)] = _combined_hash(
                path, reader(commit)
            )
        return combined_cache[(commit, path)]

    fn_cache: dict[tuple[str, str], dict[str, str]] = {}
    walkers: dict[str, _ClosureWalker] = {}

    def fn_hashes(commit: str, path: str) -> dict[str, str]:
        if (commit, path) not in fn_cache:
            w = walkers.setdefault(commit, _ClosureWalker(reader(commit)))
            fn_cache[(commit, path)] = _fn_closure_hashes(path, reader(commit), w)
        return fn_cache[(commit, path)]

    n = 0
    for rnd, rec in load_correctness_records(root):
        commit = commits.get(rnd)
        if commit is None:
            continue
        for key in rec:
            path = paths.get(key)
            if path is None:
                continue  # key no longer in the registry
            # same per-key-first, module-fallback policy as current_hashes
            h = fn_hashes(commit, path).get(key) or combined(commit, path)
            if h is None:
                continue  # module path didn't exist then (key moved modules)
            hashes.setdefault(key, {})[str(rnd)] = h
            n += 1
    save_sidecar(root, hashes)
    return n


def _newest_round(root: str) -> int:
    from tools.coverage_order import load_correctness_records

    rounds = [r for r, _ in load_correctness_records(root)]
    return max(rounds) if rounds else 0


def main(argv: list[str]) -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not argv:
        print(__doc__)
        return 2
    cmd = argv[0]
    if cmd == "snapshot":
        round_no = (
            int(argv[argv.index("--round") + 1])
            if "--round" in argv
            else _newest_round(root) + 1
        )
        n = stamp(root, round_no)
        print(f"stamped {n} keys for upcoming round r{round_no:02d}")
        return 0
    if cmd == "bootstrap":
        round_no = _newest_round(root)
        if round_no == 0:
            print("no CORRECTNESS records; nothing to bootstrap")
            return 1
        # Only stamp keys actually recorded in that round: for them (and
        # only them) the current tree is known to equal the verified tree.
        from hivekudu_handler_spark.registry import load_all
        from tools.coverage_order import load_correctness_records

        records = dict(load_correctness_records(root))
        recorded_keys = set(records[round_no])
        specs = load_all()
        cur = current_hashes(specs)
        hashes = load_sidecar(root)
        n = 0
        for key in recorded_keys & set(cur):
            hashes.setdefault(key, {})[str(round_no)] = cur[key]
            n += 1
        save_sidecar(root, hashes)
        print(f"bootstrapped {n} keys from CORRECTNESS_r{round_no:02d}")
        return 0
    if cmd == "backfill":
        n = backfill(root)
        print(f"backfilled {n} (round, key) stamps from verified commits")
        return 0
    print(f"unknown command: {cmd}")
    return 2


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
