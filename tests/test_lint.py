"""Undefined-name lint over every Python source in the repo.

A pyflakes-class check built on the stdlib `symtable`: any bare name
referenced from a function/class scope that is neither local, free
(closure), a parameter, imported, nor bound at module level (or a
builtin) is an undefined global — the exact bug class that shipped in
round 3 (`_ans_encode_device` called but defined nowhere; the TPU bench
crashed with NameError).  No third-party linter exists in this image, so
this test IS the lint gate.
"""
import builtins
import os
import symtable

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROOTS = ["divans_tpu", "research", "tests", "bench.py", "__graft_entry__.py"]

BUILTIN_NAMES = set(dir(builtins)) | {
    "__file__", "__name__", "__doc__", "__package__", "__spec__",
    "__loader__", "__builtins__", "__debug__", "__annotations__",
    "__path__", "__class__", "__module__", "__qualname__", "__dict__",
}


def _py_files():
    out = []
    for root in ROOTS:
        path = os.path.join(REPO, root)
        if os.path.isfile(path):
            out.append(path)
            continue
        for d, _dirs, files in os.walk(path):
            if "__pycache__" in d:
                continue
            out += [os.path.join(d, f) for f in files if f.endswith(".py")]
    return sorted(out)


def _module_bindings(table):
    """Names bound at module scope (assignments, defs, classes, imports)."""
    names = set()
    for sym in table.get_symbols():
        if sym.is_assigned() or sym.is_imported():
            names.add(sym.get_name())
    return names


def _global_assignments(table, out):
    """Names bound via `global x; x = ...` inside any nested scope."""
    for child in table.get_children():
        for sym in child.get_symbols():
            if sym.is_declared_global() and sym.is_assigned():
                out.add(sym.get_name())
        _global_assignments(child, out)


def _check_scope(table, module_names, path, errors):
    for sym in table.get_symbols():
        if not sym.is_referenced():
            continue
        name = sym.get_name()
        if (sym.is_local() or sym.is_parameter() or sym.is_imported()
                or sym.is_free()):
            continue
        # unbound in this scope and not a closure: resolves to module
        # globals then builtins
        if name in module_names or name in BUILTIN_NAMES:
            continue
        errors.append(f"{os.path.relpath(path, REPO)}: undefined name "
                      f"'{name}' in scope '{table.get_name()}' "
                      f"(line ~{table.get_lineno()})")
    for child in table.get_children():
        _check_scope(child, module_names, path, errors)


@pytest.mark.parametrize("path", _py_files(),
                         ids=lambda p: os.path.relpath(p, REPO))
def test_no_undefined_names(path):
    src = open(path, encoding="utf-8").read()
    table = symtable.symtable(src, path, "exec")
    module_names = _module_bindings(table) | BUILTIN_NAMES
    _global_assignments(table, module_names)
    errors = []
    for child in table.get_children():
        _check_scope(child, module_names, path, errors)
    assert not errors, "\n".join(errors)
