"""Meta-tests: CI must keep its coverage guarantees.

Counterpart of the reference's test/test_production_gates.jl, which greps
its own workflow so edits cannot silently drop the distributed/MPI jobs.
Here the guarded coverage is: the 8-virtual-device mesh environment, the
multichip dryrun job, the full (slow-inclusive) suite job, and the
regression-gate job.
"""
import pathlib

ROOT = pathlib.Path(__file__).resolve().parents[1]
CI = ROOT / ".github" / "workflows" / "ci.yml"


def _ci_text():
    assert CI.exists(), "CI workflow file is missing"
    return CI.read_text()


def test_ci_forces_virtual_device_mesh():
    text = _ci_text()
    assert "--xla_force_host_platform_device_count=8" in text, (
        "CI no longer runs on an 8-virtual-device mesh; sharded paths "
        "would go untested")


def test_ci_runs_multichip_dryrun():
    text = _ci_text()
    assert "dryrun_multichip(8)" in text, (
        "CI dropped the multichip dryrun job (the analog of the "
        "reference's FEASTKIT_TEST_DISTRIBUTED / mpiexec jobs)")


def test_ci_has_fast_and_full_jobs():
    text = _ci_text()
    assert '-m "not slow"' in text, "CI lost the fast (not slow) job"
    # the full job runs the suite WITHOUT the marker filter
    assert text.count("python -m pytest tests/ -q") >= 2, (
        "CI lost the full (slow-inclusive) suite job")


def test_ci_runs_regression_gates():
    text = _ci_text()
    assert "test_regression_gates.py" in text, (
        "CI dropped the compile-count / wall-time regression gates")


def test_ci_entry_compile_check():
    text = _ci_text()
    assert "g.entry()" in text and ".compile()" in text, (
        "CI dropped the single-chip entry compile check")
