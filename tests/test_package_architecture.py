"""Package layering rules as a test (reference
tests/test_runtime/test_package_architecture.py pattern): import rules are
checked by AST so a violating import fails CI before it becomes coupling.

Two rule families:
- framework-free zones: contracts/config/control-plane/data-prep modules may
  not import jax/torch/flax/optax (the control plane is metadata-only and
  must stay runnable on tensor-free producer hosts);
- layer boundaries: lower layers may not import higher ones (ops < models <
  algorithms < training < application).
"""

import ast
import os

import pytest

PKG = "specforge_tpu"
ROOT = os.path.join(os.path.dirname(__file__), "..", PKG)

TENSOR_LIBS = ("jax", "torch", "flax", "optax")

#: modules that must not import any tensor framework, even lazily
FRAMEWORK_FREE = (
    "runtime/contracts.py",
    "runtime/control_plane/controller.py",
    "runtime/control_plane/metadata_store.py",
    "runtime/control_plane/flow_control.py",
    "config/schema.py",
    "algorithms/contracts.py",
    "algorithms/registry.py",
    "data/template.py",
    "data/parse.py",
    "data/prompt_builder.py",
    "launch_plan.py",
)

#: allowed internal dependency prefixes per package directory (first match
#: on the module's path inside the package). "utils" is a leaf helper.
LAYER_RULES = {
    "ops/": ("ops.",),
    "parallel/": ("parallel.", "ops."),
    "models/": ("models.", "ops.", "parallel.", "utils"),
    "runtime/": ("runtime.",),
    "config/": ("config.",),
    "data/": ("data.", "runtime.contracts"),
    "eval/": ("eval.", "runtime.contracts"),
    # builtin registrations are the executable-provider layer: they may wire
    # training strategies (reference providers build StepProviders the same
    # way) but nothing else from training
    "algorithms/": (
        "algorithms.", "models.", "ops.", "utils", "training.strategies",
    ),
    # export reads training artifacts: the vocab-mapping cache and the
    # checkpoint-dir resolver (one resolver shared with training.resume_from)
    "export/": (
        "export.", "models.", "training.vocab_mapping",
        "training.checkpoint",
    ),
    "training/": (
        "training.", "ops.", "models.", "parallel.", "eval.",
        "runtime.", "export.", "utils",
    ),
    "offline_capture/": (
        "offline_capture.", "models.", "parallel.", "runtime.",
    ),
    "inference/": (
        "inference.", "runtime.", "models.", "ops.", "offline_capture.",
        # composition-root entry points may reach up to application wiring
        "application.", "config.",
        # mesh-sharded capture/serving (decoders and servers shard targets
        # over the fsdp axis, like offline_capture)
        "parallel.",
    ),
}


def _module_imports(path):
    tree = ast.parse(open(path).read())
    out = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            out |= {a.name for a in node.names}
        elif isinstance(node, ast.ImportFrom) and node.module:
            if node.module.startswith(PKG):
                # resolve `from pkg.a import b` to pkg.a.b so a rule like
                # "training.strategies" matches either import spelling
                out |= {f"{node.module}.{a.name}" for a in node.names}
            else:
                out.add(node.module)
    return out


def _walk_package():
    for root, _dirs, files in os.walk(ROOT):
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                rel = os.path.relpath(full, ROOT)
                yield rel, full


def test_framework_free_zones():
    bad = []
    for rel in FRAMEWORK_FREE:
        path = os.path.join(ROOT, rel)
        assert os.path.exists(path), f"rule references missing module {rel}"
        for imp in _module_imports(path):
            top = imp.split(".")[0]
            if top in TENSOR_LIBS:
                bad.append(f"{rel} imports {imp}")
    assert not bad, "\n".join(bad)


def test_layer_boundaries():
    bad = []
    for rel, full in _walk_package():
        rule = next(
            (v for k, v in LAYER_RULES.items() if rel.startswith(k)), None
        )
        if rule is None:
            continue  # top-level wiring modules (cli, application, bench…)
        for imp in _module_imports(full):
            if not imp.startswith(PKG + "."):
                continue
            inner = imp[len(PKG) + 1:]
            if not any(
                inner == a.rstrip(".") or inner.startswith(a)
                for a in rule
            ):
                bad.append(f"{rel} -> {imp}")
    assert not bad, "layering violations:\n" + "\n".join(bad)


def test_control_plane_has_no_tensor_free_regression():
    """Every control-plane module stays importable with tensor libs blocked
    (the producer role runs on CPU-only hosts with no jax initialization)."""
    import builtins
    import importlib
    import sys

    mods = [
        f"{PKG}.runtime.contracts",
        f"{PKG}.runtime.control_plane.controller",
        f"{PKG}.runtime.control_plane.metadata_store",
        f"{PKG}.config.schema",
    ]
    real_import = builtins.__import__

    def guarded(name, *a, **kw):
        if name.split(".")[0] in TENSOR_LIBS:
            raise AssertionError(f"tensor lib import: {name}")
        return real_import(name, *a, **kw)

    saved = {m: sys.modules.pop(m) for m in list(mods) if m in sys.modules}
    builtins.__import__ = guarded
    try:
        for m in mods:
            importlib.import_module(m)
    finally:
        builtins.__import__ = real_import
        sys.modules.update(saved)
