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


def _on_line(code, line):
    fname = code.co_filename
    if fname.startswith(str(PKG_ROOT)):
        _covered.setdefault(fname, set()).add(line)
    return sys.monitoring.DISABLE


def start():
    # type: () -> None
    tool = sys.monitoring.COVERAGE_ID
    sys.monitoring.use_tool_id(tool, "pycov")
    sys.monitoring.register_callback(tool, sys.monitoring.events.LINE, _on_line)
    sys.monitoring.set_events(tool, sys.monitoring.events.LINE)


def _code_lines(code):
    # type: (...) -> set[int]
    # line 0 is the synthetic RESUME line of module code objects on 3.12 —
    # never reported by the LINE event, so counting it miscounts every file
    lines = {line for _, _, line in code.co_lines() if line}
    for const in code.co_consts:
        if hasattr(const, "co_lines"):
            lines |= _code_lines(const)
    return lines


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


def report(out_path="COVERAGE.json"):
    # type: (str) -> dict
    import fnmatch

    omit = _omit_patterns()
    files = {}
    total_exec = total_hit = 0
    for path in sorted(PKG_ROOT.rglob("*.py")):
        rel = str(path.relative_to(PKG_ROOT.parent))
        if any(fnmatch.fnmatch(rel, pat) for pat in omit):
            continue
        text = path.read_text()
        try:
            code = compile(text, str(path), "exec")
        except SyntaxError:  # pragma: no cover - source tree always compiles
            continue
        executable = _code_lines(code) - _excluded_lines(path, text)
        hit = _covered.get(str(path), set()) & executable
        missing = sorted(executable - hit)
        files[rel] = {
            "lines": len(executable),
            "covered": len(hit),
            "pct": round(100 * len(hit) / len(executable), 1) if executable else 100.0,
            "missing": missing,
        }
        total_exec += len(executable)
        total_hit += len(hit)
    summary = {
        "total_lines": total_exec,
        "covered_lines": total_hit,
        "pct": round(100 * total_hit / max(total_exec, 1), 2),
        "files": files,
    }
    Path(out_path).write_text(json.dumps(summary, indent=1))
    return summary


def main():
    # type: () -> int
    args = sys.argv[1:]
    min_pct = 90.0
    if "--min" in args:
        i = args.index("--min")
        try:
            min_pct = float(args[i + 1])
        except (IndexError, ValueError):
            print("usage: pycov.py [--min PCT] [pytest args...]", file=sys.stderr)
            return 2
        del args[i : i + 2]
    else:
        try:
            import tomllib

            # Absolute path: reading from the invoking CWD would silently
            # fall back to the default gate when run from elsewhere.
            cfg = tomllib.loads((PKG_ROOT.parent / "pyproject.toml").read_text())
            min_pct = float(cfg.get("tool", {}).get("pycov", {}).get("min", min_pct))
        except Exception:
            pass

    repo_root = str(PKG_ROOT.parent)
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    os.chdir(repo_root)
    start()
    import pytest

    rc = pytest.main(args or ["tests/", "-q"])
    summary = report()
    worst = sorted(summary["files"].items(), key=lambda kv: kv[1]["pct"])[:10]
    print("\n---- pycov: line coverage over iscc_search_tpu ----")
    for name, info in worst:
        print(f"  {info['pct']:6.1f}%  {name}  ({info['covered']}/{info['lines']})")
    print(f"TOTAL: {summary['pct']}% ({summary['covered_lines']}/{summary['total_lines']} lines), gate {min_pct}%")
    if rc != 0:
        return int(rc)
    if summary["pct"] < min_pct:
        print(f"FAIL: coverage {summary['pct']}% is below the {min_pct}% gate")
        return 2
    print("coverage gate PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
