"""Static checks for the strong-scaling harness (bench/scaling.py).

The harness runs its measured workloads as ``python -c`` subprocesses
built by ``str.format`` over raw-string templates.  A stray brace or a
renamed placeholder only explodes at measurement time — an hour into a
quiet-window run — so these tests format every template exactly the way
``main()`` does and ``ast.parse`` the result.  No Spark session is
started.
"""
import ast
import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "scaling", os.path.join(REPO, "bench", "scaling.py"))
scaling = importlib.util.module_from_spec(spec)
spec.loader.exec_module(scaling)


def test_run_snippet_formats_and_parses_without_pregen():
    code = scaling.RUN_SNIPPET.format(
        repo=REPO, cpus=8, edges=20_000_000, vertices=2_000_000,
        strategy="broadcast", edges_path=None, partitions=8,
        driver_mem="24g")
    tree = ast.parse(code)
    # generation branch must be reachable when no path is given
    assert "powerlaw_edges" in code
    assert tree.body


def test_run_snippet_formats_and_parses_with_pregen():
    code = scaling.RUN_SNIPPET.format(
        repo=REPO, cpus=1, edges=80_000_000, vertices=200_000,
        strategy="shuffle", edges_path="/tmp/edges", partitions=8,
        driver_mem="48g")
    ast.parse(code)
    assert "read.parquet" in code
    # the repr-quoted path must round-trip into the scan branch
    assert "'/tmp/edges'" in code


def test_gen_snippet_formats_and_parses():
    code = scaling.GEN_SNIPPET.format(
        repo=REPO, gen_cpus=32, edges=80_000_000, vertices=200_000,
        edges_path="/tmp/edges", driver_mem="48g")
    ast.parse(code)
    assert "write.mode" in code


def test_calibration_snippets_format_and_parse():
    ast.parse(scaling.CALIB_SNIPPET.format(repo=REPO, cpus=4))
    ast.parse(scaling.SPIN_SNIPPET.format(cpus=4))
