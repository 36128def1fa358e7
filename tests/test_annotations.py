"""Static typing gate: full annotation coverage of the package API.

The reference enforces `mypy strict` (`/root/reference/mypy.ini:1-7`). mypy
is not installed in this offline build environment (see the honesty note in
`mypy.ini`), so this AST-based check is the enforceable half of that
contract: every module-level function and every class method in
`reprover_tpu` must have a complete signature — all parameters annotated
(except self/cls) and an explicit return type (except `__init__`).

Nested closures (jit bodies, scan steps) are exempt, matching what matters
for the package's public typing surface.
"""

import ast
import pathlib

PACKAGE = pathlib.Path(__file__).resolve().parent.parent / "reprover_tpu"


def _missing_annotations() -> list:
    missing = []
    for path in sorted(PACKAGE.rglob("*.py")):
        tree = ast.parse(path.read_text())

        def check(node: ast.AST) -> None:
            args = node.args
            all_args = args.posonlyargs + args.args + args.kwonlyargs
            unannotated = [
                a.arg
                for a in all_args
                if a.annotation is None and a.arg not in ("self", "cls")
            ]
            if args.vararg is not None and args.vararg.annotation is None:
                unannotated.append("*" + args.vararg.arg)
            if args.kwarg is not None and args.kwarg.annotation is None:
                unannotated.append("**" + args.kwarg.arg)
            no_return = node.returns is None and node.name != "__init__"
            if unannotated or no_return:
                missing.append(
                    f"{path.relative_to(PACKAGE)}:{node.lineno} {node.name}"
                    f" (params: {unannotated}, return: {no_return})"
                )

        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                check(node)
            elif isinstance(node, ast.ClassDef):
                for sub in node.body:
                    if isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef)):
                        check(sub)
    return missing


def test_all_module_level_functions_annotated() -> None:
    missing = _missing_annotations()
    assert not missing, "unannotated signatures:\n" + "\n".join(missing)
