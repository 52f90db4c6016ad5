"""In-process gmapper CLI runner for tests.

Each subprocess `python -m shrimp_tpu.gmapper` invocation pays the JAX
import (~3s) plus compile-cache loading; across the suite's dozens of CLI
tests that is most of the wall time.  Running `gmapper.main` in-process
reuses the warm JAX runtime and jitted kernels.  The true subprocess
surface stays covered by test_cli.py::test_cli_subprocess_smoke.

Returns an object shaped like subprocess.CompletedProcess (returncode /
stdout / stderr), so call sites swap in without changes.
"""

from __future__ import annotations

import contextlib
import io
import os
from types import SimpleNamespace


def run_gmapper(args, cwd: str | None = None, **kw):
    """Run the gmapper CLI in-process; mirrors
    subprocess.run([python, -m, shrimp_tpu.gmapper] + args,
    capture_output=True, text=True)."""
    if kw:
        # env=/input=/timeout= need the true-subprocess interface; fail
        # loudly rather than run against the ambient process state
        raise TypeError(f"run_gmapper cannot emulate kwargs: {sorted(kw)}")
    from shrimp_tpu import gmapper

    so, se = io.StringIO(), io.StringIO()
    prev = os.getcwd()
    if cwd:
        os.chdir(cwd)
    try:
        with contextlib.redirect_stdout(so), contextlib.redirect_stderr(se):
            try:
                rc = gmapper.main(["gmapper"] + list(args))
            except SystemExit as e:
                rc = e.code if isinstance(e.code, int) else (
                    0 if e.code is None else 1)
    finally:
        if cwd:
            os.chdir(prev)
    return SimpleNamespace(returncode=rc, stdout=so.getvalue(),
                           stderr=se.getvalue())


def run_module(mod: str, args, cwd: str | None = None, **kw):
    """Run any shrimp_tpu tool CLI (module with main(argv)->int)
    in-process; mirrors subprocess.run([python, -m, mod] + args)."""
    if kw:
        raise TypeError(f"run_module cannot emulate kwargs: {sorted(kw)}")
    import importlib

    m = importlib.import_module(mod)
    so, se = io.StringIO(), io.StringIO()
    prev = os.getcwd()
    if cwd:
        os.chdir(cwd)
    try:
        with contextlib.redirect_stdout(so), contextlib.redirect_stderr(se):
            try:
                rc = m.main([mod.rsplit(".", 1)[-1]] + list(args))
            except SystemExit as e:
                rc = e.code if isinstance(e.code, int) else (
                    0 if e.code is None else 1)
    finally:
        if cwd:
            os.chdir(prev)
    return SimpleNamespace(returncode=rc, stdout=so.getvalue(),
                           stderr=se.getvalue())
