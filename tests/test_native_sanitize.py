"""Sanitizer gate for the native sampler (VERDICT r1 item 7).

Builds ``sampler.cpp`` + the standalone driver under ASAN+UBSAN and under
TSAN and runs it: BFS, batch assembly (5 generations over shared stamped
scratch), PinSAGE frontier, walk step — all OpenMP-parallel paths. The
reference needed no sanitizers (100% Python, SURVEY §5); this build has a
native layer and gates it here and in CI.
"""
import subprocess

import pytest

from laplace_gnn_recommendation_tpu import native


def _has_sanitizer(flag: str) -> bool:
    """g++ present and able to link the sanitizer runtime."""
    probe = (
        "echo 'int main(){return 0;}' | "
        f"g++ -x c++ - -fsanitize={flag} -fopenmp -o /dev/null"
    )
    try:
        return subprocess.run(
            probe, shell=True, capture_output=True, timeout=120
        ).returncode == 0
    except Exception:
        return False


@pytest.mark.skipif(not _has_sanitizer("address"), reason="no ASAN runtime")
def test_native_asan_ubsan_clean():
    ok, out = native.run_sanitizer_check("asan")
    assert ok, out
    assert "sanitize_check ok" in out


@pytest.mark.skipif(not _has_sanitizer("thread"), reason="no TSAN runtime")
def test_native_tsan_clean():
    ok, out = native.run_sanitizer_check("tsan")
    assert ok, out
    assert "sanitize_check ok" in out
