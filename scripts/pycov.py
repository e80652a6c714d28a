"""
Line coverage for iscc_search_tpu without external tooling.

pytest-cov/coverage.py are not installable in this environment, so this
implements the reference's coverage-gate requirement (reference
pyproject.toml:106-113 enforces 100% line+branch; our gate is line coverage
over the same source tree) on Python 3.12's sys.monitoring: a LINE-event
callback records each (file, line) once and then disables itself for that
location, so steady-state overhead is near zero.

Usage (the gate):
    python scripts/pycov.py [--min PCT] [pytest args...]

runs pytest in-process with collection enabled, writes COVERAGE.json, prints
a per-file summary, and exits non-zero when total line coverage is below
--min (default from pyproject [tool.pycov] min, else 90).

Executable lines are derived from compiling each source file and walking its
code objects (same compiler the runtime uses), minus pragma-excluded lines
("pragma: no cover" plus any continuation of that statement).
"""

from __future__ import annotations

import ast
import json
import os
import sys
from pathlib import Path

PKG_ROOT = Path(__file__).resolve().parent.parent / "iscc_search_tpu"

_covered = {}  # type: dict[str, set[int]]
_branches = {}  # type: dict[tuple[str, str, int], set[int]]

# Conditional-branch opcodes on CPython 3.12 (the set the BRANCH monitoring
# event fires for): two-successor instructions only — unconditional jumps
# (JUMP_FORWARD/BACKWARD) never fire and are not branch sites. SEND (the
# await/yield-from resume) is deliberately EXCLUDED: coverage.py's branch
# semantics derive from source-level arcs and do not treat awaits as
# branches — counting SEND adds uncoverable "which way did the coroutine
# resume" sites on every await expression.
_COND_BRANCH_OPS = frozenset(
    {"FOR_ITER", "POP_JUMP_IF_FALSE", "POP_JUMP_IF_TRUE", "POP_JUMP_IF_NONE", "POP_JUMP_IF_NOT_NONE"}
)


def _on_line(code, line):
    fname = code.co_filename
    if fname.startswith(str(PKG_ROOT)):
        _covered.setdefault(fname, set()).add(line)
    return sys.monitoring.DISABLE


def _on_branch(code, offset, dest):
    fname = code.co_filename
    if not fname.startswith(str(PKG_ROOT)):
        return sys.monitoring.DISABLE
    seen = _branches.setdefault((fname, code.co_qualname, offset), set())
    seen.add(dest)
    # Conditional branches have exactly two successors: once both are
    # observed this location is fully covered — stop monitoring it.
    if len(seen) >= 2:
        return sys.monitoring.DISABLE
    return None


def start():
    # type: () -> None
    tool = sys.monitoring.COVERAGE_ID
    sys.monitoring.use_tool_id(tool, "pycov")
    sys.monitoring.register_callback(tool, sys.monitoring.events.LINE, _on_line)
    sys.monitoring.register_callback(tool, sys.monitoring.events.BRANCH, _on_branch)
    sys.monitoring.set_events(tool, sys.monitoring.events.LINE | sys.monitoring.events.BRANCH)


def _code_lines(code):
    # type: (...) -> set[int]
    # line 0 is the synthetic RESUME line of module code objects on 3.12 —
    # never reported by the LINE event, so counting it miscounts every file
    lines = {line for _, _, line in code.co_lines() if line}
    for const in code.co_consts:
        if hasattr(const, "co_lines"):
            lines |= _code_lines(const)
    return lines


def _branch_stmt_lines(tree):
    # type: (ast.AST) -> set[int]
    """Lines hosting source-level branch constructs (if/while/for/ternary/
    comprehension filters) — the coverage.py-comparable branch universe.
    Restricting the bytecode sites to these lines excludes branches the
    source cannot reasonably exercise both ways (with-statement exception
    exits, asserts, bare and/or shortcuts in straight-line code)."""
    lines = set()

    def span(node):
        if hasattr(node, "lineno") and node.end_lineno:
            lines.update(range(node.lineno, node.end_lineno + 1))

    for node in ast.walk(tree):
        if isinstance(node, (ast.If, ast.While)):
            span(node.test)
        elif isinstance(node, (ast.For, ast.AsyncFor)):
            lines.add(node.lineno)
            span(node.iter)
        elif isinstance(node, ast.IfExp):
            span(node.test)
        elif isinstance(node, ast.comprehension):
            span(node.iter)
            for cond in node.ifs:
                span(cond)
    return lines


def _branch_sites(code, excluded, branch_lines):
    # type: (...) -> dict[tuple[str, int], int]
    """Static conditional-branch sites of a code object tree:
    {(qualname, instruction offset): line}, excluding pragma'd lines and
    lines outside the source-level branch universe."""
    import dis

    sites = {}
    for instr in dis.get_instructions(code):
        line = instr.positions.lineno if instr.positions else None
        if (
            instr.opname in _COND_BRANCH_OPS
            and line
            and line not in excluded
            and line in branch_lines
        ):
            sites[(code.co_qualname, instr.offset)] = line
    for const in code.co_consts:
        if hasattr(const, "co_lines"):
            sites.update(_branch_sites(const, excluded, branch_lines))
    return sites


def _excluded_lines(path, text):
    # type: (Path, str) -> set[int]
    """Lines opted out via 'pragma: no cover' — the whole statement/block."""
    raw = text.splitlines()
    marked = {i + 1 for i, line in enumerate(raw) if "pragma: no cover" in line}
    if not marked:
        return set()
    excluded = set(marked)
    tree = ast.parse(text, str(path))
    block_types = (
        ast.FunctionDef,
        ast.AsyncFunctionDef,
        ast.ClassDef,
        ast.If,
        ast.For,
        ast.While,
        ast.Try,
        ast.With,
        ast.ExceptHandler,  # 'except ...:  # pragma: no cover' excludes the handler BODY
    )
    for node in ast.walk(tree):
        start_line = getattr(node, "lineno", None)
        end_line = getattr(node, "end_lineno", None)
        if start_line is None or end_line is None:
            continue
        # A pragma on a block header (def/if/except line) excludes the block.
        if start_line in marked and isinstance(node, block_types):
            excluded.update(range(start_line, end_line + 1))
        # 'else:' has no AST node of its own: a pragma on the else line of an
        # if/for/while excludes the orelse body (found via its statements).
        orelse = getattr(node, "orelse", None)
        if isinstance(orelse, list) and orelse:  # IfExp.orelse is a single node, skip
            else_line = orelse[0].lineno - 1
            if else_line in marked and raw[else_line - 1].strip().startswith("else"):
                excluded.update(range(else_line, orelse[-1].end_lineno + 1))
    return excluded


def _omit_patterns():
    # type: () -> list[str]
    """[tool.pycov] omit globs (relative to the package parent). Mirrors the
    reference gate's omission of the typing-only protocol module
    (reference pyproject.toml:106-113 omits protocols from measurement)."""
    try:
        import tomllib

        cfg = tomllib.loads((PKG_ROOT.parent / "pyproject.toml").read_text())
        return list(cfg.get("tool", {}).get("pycov", {}).get("omit", []))
    except Exception:  # pragma: no cover
        return []


def _justified_arms():
    # type: () -> dict[str, str]
    """[tool.pycov.justified] — residual branch arms that are accepted as
    untestable, each with its reason, keyed "<rel-path>:<line>". The gate
    FAILS on any missing branch arm that is not justified here, and on any
    stale justification (the arm became covered or the line moved): the
    justification table must describe exactly the measured residue, so
    COVERAGE.json itself carries the evidence."""
    try:
        import tomllib

        cfg = tomllib.loads((PKG_ROOT.parent / "pyproject.toml").read_text())
        return dict(cfg.get("tool", {}).get("pycov", {}).get("justified", {}))
    except Exception:  # pragma: no cover
        return {}


def report(out_path="COVERAGE.json"):
    # type: (str) -> dict
    import fnmatch

    omit = _omit_patterns()
    justified = _justified_arms()
    files = {}
    total_exec = total_hit = 0
    total_br = total_br_hit = 0
    for path in sorted(PKG_ROOT.rglob("*.py")):
        rel = str(path.relative_to(PKG_ROOT.parent))
        if any(fnmatch.fnmatch(rel, pat) for pat in omit):
            continue
        text = path.read_text()
        try:
            code = compile(text, str(path), "exec")
        except SyntaxError:  # pragma: no cover - source tree always compiles
            continue
        excluded = _excluded_lines(path, text)
        executable = _code_lines(code) - excluded
        hit = _covered.get(str(path), set()) & executable
        missing = sorted(executable - hit)
        # Branch outcomes: every conditional branch has two successors; a
        # site is fully covered when the BRANCH event saw both destinations.
        sites = _branch_sites(code, excluded, _branch_stmt_lines(ast.parse(text, str(path))))
        br_total = 2 * len(sites)
        br_hit = 0
        missing_branches = []
        for (qualname, offset), line in sorted(sites.items(), key=lambda kv: kv[1]):
            seen = _branches.get((str(path), qualname, offset), ())
            br_hit += min(len(seen), 2)
            if len(seen) < 2:
                missing_branches.append(line)
        miss_br = sorted(set(missing_branches))
        files[rel] = {
            "lines": len(executable),
            "covered": len(hit),
            "pct": round(100 * len(hit) / len(executable), 1) if executable else 100.0,
            "missing": missing,
            "branches": br_total,
            "branches_covered": br_hit,
            "branch_pct": round(100 * br_hit / br_total, 1) if br_total else 100.0,
            "missing_branches": miss_br,
            # Residual arms carry their acceptance reason IN the artifact
            # ([tool.pycov.justified]); anything without one fails the gate.
            "justified_branches": {str(ln): justified[f"{rel}:{ln}"] for ln in miss_br if f"{rel}:{ln}" in justified},
            "unjustified_branches": [ln for ln in miss_br if f"{rel}:{ln}" not in justified],
        }
        total_exec += len(executable)
        total_hit += len(hit)
        total_br += br_total
        total_br_hit += br_hit
    all_missing = {f"{rel}:{ln}" for rel, info in files.items() for ln in info["missing_branches"]}
    summary = {
        "total_lines": total_exec,
        "covered_lines": total_hit,
        "pct": round(100 * total_hit / max(total_exec, 1), 2),
        "total_branches": total_br,
        "covered_branches": total_br_hit,
        "branch_pct": round(100 * total_br_hit / max(total_br, 1), 2),
        "unjustified_branch_arms": sorted(all_missing - set(justified)),
        "stale_justifications": sorted(set(justified) - all_missing),
        "files": files,
    }
    Path(out_path).write_text(json.dumps(summary, indent=1))
    return summary


def main():
    # type: () -> int
    args = sys.argv[1:]
    min_pct = 90.0
    branch_min = 85.0
    try:
        import tomllib

        # Absolute path: reading from the invoking CWD would silently
        # fall back to the default gate when run from elsewhere.
        cfg = tomllib.loads((PKG_ROOT.parent / "pyproject.toml").read_text())
        min_pct = float(cfg.get("tool", {}).get("pycov", {}).get("min", min_pct))
        branch_min = float(cfg.get("tool", {}).get("pycov", {}).get("branch_min", branch_min))
    except Exception:
        pass
    if "--min" in args:
        i = args.index("--min")
        try:
            min_pct = float(args[i + 1])
        except (IndexError, ValueError):
            print("usage: pycov.py [--min PCT] [--branch-min PCT] [pytest args...]", file=sys.stderr)
            return 2
        del args[i : i + 2]
    if "--branch-min" in args:
        i = args.index("--branch-min")
        try:
            branch_min = float(args[i + 1])
        except (IndexError, ValueError):
            print("usage: pycov.py [--min PCT] [--branch-min PCT] [pytest args...]", file=sys.stderr)
            return 2
        del args[i : i + 2]

    repo_root = str(PKG_ROOT.parent)
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    os.chdir(repo_root)
    start()
    import pytest

    rc = pytest.main(args or ["tests/", "-q"])
    summary = report()
    worst = sorted(summary["files"].items(), key=lambda kv: kv[1]["pct"])[:10]
    print("\n---- pycov: line + branch coverage over iscc_search_tpu ----")
    for name, info in worst:
        print(
            f"  {info['pct']:6.1f}% / {info['branch_pct']:6.1f}%br  {name}  "
            f"({info['covered']}/{info['lines']} lines, {info['branches_covered']}/{info['branches']} branches)"
        )
    print(
        f"TOTAL: {summary['pct']}% lines ({summary['covered_lines']}/{summary['total_lines']}), "
        f"{summary['branch_pct']}% branches ({summary['covered_branches']}/{summary['total_branches']}), "
        f"gates {min_pct}% / {branch_min}%br"
    )
    if rc != 0:
        return int(rc)
    failed = False
    if summary["pct"] < min_pct:
        print(f"FAIL: line coverage {summary['pct']}% is below the {min_pct}% gate")
        failed = True
    if summary["branch_pct"] < branch_min:
        print(f"FAIL: branch coverage {summary['branch_pct']}% is below the {branch_min}% gate")
        failed = True
    # Residual-arm discipline: every missing branch arm must carry a reason
    # in [tool.pycov.justified], and no justification may outlive its arm.
    if summary["unjustified_branch_arms"]:
        print(f"FAIL: missing branch arms without a justification: {summary['unjustified_branch_arms']}")
        failed = True
    if summary["stale_justifications"]:
        print(f"FAIL: stale justifications (arm covered or moved): {summary['stale_justifications']}")
        failed = True
    if failed:
        return 2
    print("coverage gates PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
