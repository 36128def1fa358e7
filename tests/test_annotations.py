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


def _iter_package_modules() -> list:
    import importlib

    mods = []
    for path in sorted(PACKAGE.rglob("*.py")):
        rel = path.relative_to(PACKAGE.parent).with_suffix("")
        name = ".".join(rel.parts)
        if name.endswith(".__init__"):
            name = name[: -len(".__init__")]
        mods.append(importlib.import_module(name))
    return mods


def test_annotations_resolve() -> None:
    """Every annotation must NAME A REAL TYPE: `typing.get_type_hints` on
    each public function/method fails on annotations referencing
    nonexistent classes (the bug class the round-3 advisor caught twice —
    presence-only checks can't). Machine-checkable half of the reference's
    `mypy strict` gate (`/root/reference/mypy.ini:1-7`)."""
    import inspect
    import typing

    failures = []
    for mod in _iter_package_modules():
        for name, obj in vars(mod).items():
            if getattr(obj, "__module__", None) != mod.__name__:
                continue  # re-exports are checked in their home module
            targets = []
            if inspect.isfunction(obj):
                targets.append((f"{mod.__name__}.{name}", obj))
            elif inspect.isclass(obj):
                targets.append((f"{mod.__name__}.{name}", obj))
                for mname, meth in vars(obj).items():
                    fn = getattr(meth, "__func__", meth)
                    if inspect.isfunction(fn):
                        targets.append(
                            (f"{mod.__name__}.{name}.{mname}", fn)
                        )
            for label, fn in targets:
                try:
                    typing.get_type_hints(fn)
                except Exception as e:  # NameError, AttributeError, ...
                    failures.append(f"{label}: {type(e).__name__}: {e}")
    assert not failures, "unresolvable annotations:\n" + "\n".join(failures)
