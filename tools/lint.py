"""Dependency-free linter, standing in for the reference's pre-commit stack.

The reference ships black/isort/flake8/mypy/bandit/pydocstyle via pre-commit
(/root/reference/.pre-commit-config.yaml:26-66) and Makefile lint/format
targets (/root/reference/Makefile:294-304). None of those tools are
installable in the TPU-VM image (no package installs), so this module
implements the checks that stack actually enforces, using only stdlib
``ast``/``tokenize``:

* syntax (py_compile equivalent, via ast.parse)
* line length <= 99 (flake8 E501 at the repo's configured width)
* trailing whitespace (W291/W293) and tabs in indentation (W191)
* unused imports (F401), with ``# noqa`` / ``# noqa: F401`` suppression
  and the conventional exemptions: ``__init__.py`` re-exports, names in
  ``__all__``, and ``import x as x`` explicit re-export syntax
* redefinition of imports (F811, imports only)
* bare ``except:`` (E722, also bandit B110's broad-except concern)
* missing module docstring (pydocstyle D100) for package modules
* mutable default arguments (bugbear B006)

Usage: python tools/lint.py [paths...]   (defaults to git-tracked *.py)
Exit status 1 if any finding; findings print as ``path:line: CODE message``.
"""

from __future__ import annotations

import ast
import subprocess
import sys
import tokenize

MAX_LINE = 99

# names whose import is intentional side-effect / re-export machinery
_SIDE_EFFECT_MODULES = ("sitecustomize",)


def _noqa_lines(path: str) -> set[int]:
    """Line numbers carrying a ``# noqa`` comment (any code)."""
    out: set[int] = set()
    try:
        with tokenize.open(path) as fh:
            for tok in tokenize.generate_tokens(fh.readline):
                if tok.type == tokenize.COMMENT and "noqa" in tok.string:
                    out.add(tok.start[0])
    except (OSError, tokenize.TokenizeError, SyntaxError,
            IndentationError, UnicodeDecodeError):
        pass
    return out


def _iter_names(node: ast.AST):
    for sub in ast.walk(node):
        if isinstance(sub, ast.Name):
            yield sub.id
        elif isinstance(sub, ast.Attribute):
            # leftmost name of a dotted access
            inner = sub
            while isinstance(inner, ast.Attribute):
                inner = inner.value
            if isinstance(inner, ast.Name):
                yield inner.id


def _unused_imports(tree: ast.Module, path: str, findings, noqa):
    if path.endswith("__init__.py"):
        return  # re-export modules
    imported: dict[str, tuple[int, str]] = {}
    # module level only: function-scoped imports have their own scope
    # (flake8 F401/F811 semantics; the repo uses local imports to defer
    # Pallas-kernel module loads, which must not be flagged)
    for node in tree.body:
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.asname == a.name.split(".")[0] and a.asname:
                    continue  # `import x as x` explicit re-export
                name = a.asname or a.name.split(".")[0]
                if name in _SIDE_EFFECT_MODULES:
                    continue
                if name in imported and node.lineno not in noqa:
                    findings.append((path, node.lineno, "F811",
                                     f"redefinition of import {name!r}"))
                imported[name] = (node.lineno, name)
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                if a.asname == a.name and a.asname:
                    continue
                name = a.asname or a.name
                if name in imported and node.lineno not in noqa:
                    findings.append((path, node.lineno, "F811",
                                     f"redefinition of import {name!r}"))
                imported[name] = (node.lineno, name)
    if not imported:
        return
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            continue
        for name in _iter_names(node):
            used.add(name)
    # names exported via __all__ count as used
    for node in tree.body:
        if (isinstance(node, ast.Assign)
                and any(isinstance(t, ast.Name) and t.id == "__all__"
                        for t in node.targets)):
            for elt in ast.walk(node.value):
                if isinstance(elt, ast.Constant) and isinstance(elt.value,
                                                                str):
                    used.add(elt.value)
    for name, (lineno, _) in imported.items():
        if name not in used and lineno not in noqa:
            findings.append((path, lineno, "F401",
                             f"{name!r} imported but unused"))


def _check_ast(tree: ast.Module, path: str, findings, noqa, in_package):
    if (in_package and not path.endswith("__init__.py")
            and ast.get_docstring(tree) is None and 1 not in noqa):
        findings.append((path, 1, "D100", "missing module docstring"))
    _unused_imports(tree, path, findings, noqa)
    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            if node.lineno not in noqa:
                findings.append((path, node.lineno, "E722",
                                 "bare 'except:'"))
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in list(node.args.defaults) + [
                    d for d in node.args.kw_defaults if d is not None]:
                if (isinstance(d, (ast.List, ast.Dict, ast.Set))
                        and d.lineno not in noqa):
                    findings.append((path, d.lineno, "B006",
                                     "mutable default argument"))


def _check_text(path: str, findings, noqa):
    try:
        with open(path, encoding="utf-8") as fh:
            lines = fh.read().splitlines()
    except (OSError, UnicodeDecodeError) as exc:
        findings.append((path, 1, "E902", str(exc)))
        return
    for i, line in enumerate(lines, 1):
        if i in noqa:
            continue
        if len(line) > MAX_LINE:
            findings.append((path, i, "E501",
                             f"line too long ({len(line)} > {MAX_LINE})"))
        if line != line.rstrip():
            findings.append((path, i, "W291", "trailing whitespace"))
        stripped = line.lstrip(" ")
        if stripped.startswith("\t") or "\t" in line[:len(line)
                                                     - len(stripped)]:
            findings.append((path, i, "W191", "tab in indentation"))


def lint_file(path: str, findings):
    noqa = _noqa_lines(path)
    _check_text(path, findings, noqa)
    try:
        with open(path, "rb") as fh:
            tree = ast.parse(fh.read(), filename=path)
    except SyntaxError as exc:
        findings.append((path, exc.lineno or 1, "E999",
                         f"syntax error: {exc.msg}"))
        return
    in_package = path.startswith("pointcloud_style_transfer_tpu/")
    _check_ast(tree, path, findings, noqa, in_package)


def main(argv) -> int:
    paths = argv[1:]
    if not paths:
        out = subprocess.run(["git", "ls-files", "*.py"],
                             capture_output=True, text=True, check=True)
        paths = out.stdout.split()
    findings: list[tuple[str, int, str, str]] = []
    for path in paths:
        lint_file(path, findings)
    for path, line, code, msg in sorted(findings):
        print(f"{path}:{line}: {code} {msg}")
    print(f"lint: {len(paths)} files, {len(findings)} finding(s)")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
