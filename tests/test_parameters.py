"""fpm parameter contract tests (mirrors test/runtests.jl:10-70)."""
import numpy as np
import pytest

from feastkit_tpu import (FEAST_UNINITIALIZED, FeastParameters, feastdefault,
                          feastinit, feastinit_driver, feast_tolerance)


def test_feastinit_sentinels():
    fpm = feastinit()
    assert all(fpm[i] == FEAST_UNINITIALIZED for i in range(1, 65))


def test_defaults_match_reference():
    fpm = feastdefault(feastinit())
    # feast_parameters.jl defaults
    assert fpm[1] == 0       # print off
    assert fpm[2] == 8       # half-contour nodes
    assert fpm[3] == 12      # tol exponent
    assert fpm[4] == 20      # max loops
    assert fpm[5] == 0
    assert fpm[6] == 1       # residual convergence
    assert fpm[8] == 16      # full-contour nodes
    assert fpm[10] == 1      # store factorizations
    assert fpm[14] == 0
    assert fpm[16] == 0      # Gauss
    assert fpm[18] == 100    # circle
    assert fpm[19] == 0
    assert fpm[31] == 40     # FEAST v4.0
    assert fpm[42] == 1      # mixed precision
    assert fpm[45] == 1
    assert fpm[46] == 40


def test_user_overrides_survive_defaulting():
    fpm = feastinit()
    fpm[2] = 12
    fpm[3] = 8
    feastdefault(fpm)
    assert fpm[2] == 12 and fpm[3] == 8


def test_invalid_values_raise():
    for slot, bad in [(1, 5), (3, 99), (5, 7), (6, 3), (13, 9), (16, 4),
                      (19, 300)]:
        fpm = feastinit()
        fpm[slot] = bad
        with pytest.raises(ValueError):
            feastdefault(fpm)
    # fpm[2] > 20 for Gauss only allowed for specific values
    fpm = feastinit()
    fpm[2] = 23
    with pytest.raises(ValueError):
        feastdefault(fpm)
    fpm = feastinit()
    fpm[2] = 24
    feastdefault(fpm)       # allowed large value
    assert fpm[2] == 24


def test_routine_code_conditional_defaults():
    # IFEAST (digit3 == 2) -> trapezoid, 4 nodes, 50 loops
    fpm = feastinit()
    fpm[30] = 221412        # difeast_scsrgv-ish code with d3=2... build: d1=2? use 121412
    fpm = feastinit()
    fpm[30] = 122142        # d=[1,2,2,1,4,2]: dfeast (d3=2 iterative)
    feastdefault(fpm)
    assert fpm[16] == 1 and fpm[2] == 4 and fpm[4] == 50
    # general (d4=3) -> trapezoid
    fpm = feastinit()
    fpm[30] = 124352        # d=[1,2,4,3,5,2]... d4 = 3 -> general
    feastdefault(fpm)
    assert fpm[16] == 1
    # real symmetric direct -> narrow ellipse default fpm[18]=30
    fpm = feastinit()
    fpm[30] = 121152        # d=[1,2,1,1,5,2]: dfeast_sev (sym, direct)
    feastdefault(fpm)
    assert fpm[18] == 30


def test_zolotarev_rejected_for_general():
    fpm = feastinit()
    fpm[16] = 2
    fpm[30] = 124352        # general problem
    with pytest.raises(ValueError):
        feastdefault(fpm)


def test_tolerance():
    fpm = feastdefault(feastinit())
    assert feast_tolerance(fpm) == 1e-12
    fpm[3] = 6
    assert feast_tolerance(fpm) == 1e-6
    # Float32 floor at sqrt(eps)
    assert feast_tolerance(fpm, np.float32) >= np.sqrt(np.finfo(np.float32).eps)


def test_feastinit_driver_suggests_nodes():
    fpm = feastinit_driver(100)
    assert fpm[2] == 10     # ceil(sqrt(100)) = 10
    fpm = feastinit_driver(4)
    assert fpm[2] == 8      # clamped at 8
    fpm = feastinit_driver(10**6)
    assert fpm[2] == 64     # clamped at 64


def test_parameters_wrapper_round_trip():
    fpm = feastinit()
    fpm[2] = 16
    arr = fpm.to_array()
    assert arr[1] == 16
    fpm2 = FeastParameters(arr)
    assert fpm2 == fpm
    fpm3 = fpm.copy()
    fpm3[2] = 8
    assert fpm[2] == 16     # copy is independent


def test_config_host_knobs_excluded_from_hash():
    """Regression: host-side driving knobs (dispatch budget / node-group
    cap / fused-small threshold) must not participate in FeastConfig
    hash/eq — they are read only outside traced code, and including them
    invalidated every compiled program when an env override changed."""
    from feastkit_tpu.core.parameters import FeastConfig
    a = FeastConfig(dispatch_budget=1.0, group_max=7, fused_small_n=0)
    b = FeastConfig()
    assert a == b and hash(a) == hash(b)
    # compile-relevant fields still differentiate
    assert FeastConfig(ir_max=3) != b
    assert FeastConfig(tol=1e-6) != b
