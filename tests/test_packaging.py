"""Packaging sanity: pyproject metadata and native-lib discovery.

The wheel build itself (pip wheel . --no-build-isolation) is exercised out of
band; these tests pin the parts that break silently: every declared console
script must resolve to an importable callable, and the native decode
runtime's search order (env override -> packaged _native/ -> repo native/)
must behave.
"""

import importlib
import os
import tomllib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pyproject():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_scripts_resolve():
    scripts = _pyproject()["project"]["scripts"]
    assert len(scripts) == 5
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func_name)), f"{name} -> {target}"


def test_no_top_level_modules_in_wheel():
    # every console script must resolve inside the css_tpu namespace — a
    # wheel installing a bare `evaluate`/`predict` module would collide
    # with unrelated distributions (e.g. HuggingFace evaluate)
    cfg = _pyproject()
    assert "py-modules" not in cfg.get("tool", {}).get("setuptools", {})
    for target in cfg["project"]["scripts"].values():
        assert target.startswith("css_tpu."), target
    # the reference-named repo-root shims still exist and expose main()
    for m in ("ori_pseudo", "mix_label", "cross_label", "evaluate",
              "predict"):
        assert os.path.exists(os.path.join(REPO, f"{m}.py"))
        assert callable(getattr(importlib.import_module(m), "main"))


def test_config_yamls_are_package_data():
    data = _pyproject()["tool"]["setuptools"]["package-data"]
    assert "*.yaml" in data["css_tpu.config"]
    cfg_dir = os.path.join(REPO, "css_tpu", "config")
    assert any(f.endswith(".yaml") for f in os.listdir(cfg_dir))


@pytest.fixture
def fresh_native_io(monkeypatch):
    """native_io with its load-once cache reset (and restored afterwards)."""
    from css_tpu.data import native_io

    monkeypatch.setattr(native_io, "_LIB", None)
    monkeypatch.setattr(native_io, "_TRIED", False)
    # monkeypatch restores the original _LIB/_TRIED cache afterwards
    yield native_io


def test_native_lib_env_override(fresh_native_io, monkeypatch):
    lib_path = os.path.join(REPO, "native", "libcss_io.so")
    if not os.path.exists(lib_path):
        pytest.skip("native runtime not built")
    monkeypatch.setenv("CSS_TPU_NATIVE_LIB", lib_path)
    assert fresh_native_io.native_available()


def test_native_lib_bad_env_override_falls_through(fresh_native_io,
                                                   monkeypatch):
    # a nonexistent override is skipped, not fatal: the repo native/ copy
    # (or the PIL fallback) still applies
    monkeypatch.setenv("CSS_TPU_NATIVE_LIB", "/nonexistent/libcss_io.so")
    available = fresh_native_io.native_available()
    expected = os.path.exists(os.path.join(REPO, "native", "libcss_io.so"))
    assert available == expected
