"""Fused double-single Chebyshev-step Pallas kernel (ops/cheb_pallas.py).

No reference counterpart (TPU-first extension); the contract is agreement
with the f64 three-term recurrence to the DS precision (~2^-45 relative)
on the same DIA fixtures the cheb filter uses.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from feastkit_tpu.ops.cheb_pallas import (cheb_ds_chunk, cheb_plan,
                                          ds_split, pack_diags, pack_state,
                                          unpack_state)
from feastkit_tpu.ops.pallas_kernels import dia_matvec_reference


def _lap_dia(n):
    d = np.zeros((3, n))
    d[0, 1:] = -1.0          # offset -1, row-aligned
    d[1, :] = 2.0
    d[2, :-1] = -1.0         # offset +1
    return d, (-1, 0, 1)


def _lap2d_dia(nx):
    n = nx * nx
    d = np.zeros((5, n))
    offs = (-nx, -1, 0, 1, nx)
    d[2, :] = 4.0
    d[1, :] = -1.0
    d[1, ::nx] = 0.0         # row-aligned: entry (i, i-1) vanishes at col 0
    d[3, :] = -1.0
    d[3, nx - 1::nx] = 0.0
    d[0, nx:] = -1.0
    d[4, :-nx] = -1.0
    return d, offs


def test_ds_split_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(1000) * 10.0 ** rng.integers(
        -6, 6, 1000))
    hi, lo = ds_split(x)
    err = np.abs(np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
                 - np.asarray(x))
    assert err.max() <= np.abs(np.asarray(x)).max() * 2.0 ** -49


@pytest.mark.parametrize("fixture", ["lap1d", "lap2d", "off_eq_block"])
def test_cheb_ds_chunk_matches_f64(fixture):
    # a short recurrence driven through the interpret-mode kernel must
    # match the f64 three-term recurrence to DS precision
    if fixture == "lap1d":
        dia, offs = _lap_dia(300)
        N = 300
    elif fixture == "off_eq_block":
        # |offset| == the 128-aligned lane block (a 2D Laplacian whose
        # grid side equals the block): the shifted read is EXACTLY the
        # neighbor block — the zero-width concat piece Mosaic rejects
        N = 1024
        offs = (-256, -1, 0, 1, 256)
        rng0 = np.random.default_rng(7)
        dia = np.zeros((5, N))
        dia[2] = 4.0 + rng0.random(N)
        for k, d in zip((0, 1, 3, 4), (-256, -1, 1, 256)):
            if d > 0:
                dia[k, :N - d] = -rng0.random(N - d)
            else:
                dia[k, -d:] = -rng0.random(N + d)
    else:
        dia, offs = _lap2d_dia(18)
        N = 18 * 18
    M = 11
    rng = np.random.default_rng(1)
    Q = rng.standard_normal((N, M))
    lo_e, hi_e = -0.1, 8.1
    sc = 2.0 / (hi_e - lo_e)
    sh = (hi_e + lo_e) / (hi_e - lo_e)
    coeffs = rng.standard_normal(14) * 0.1

    # f64 oracle: T0 = Q, T1 = Ahat Q, acc = 0; then steps for k = 2..
    dia_j = jnp.asarray(dia)
    T0 = jnp.asarray(Q)
    T1 = sc * dia_matvec_reference(dia_j, T0, offs) - sh * T0
    acc = jnp.zeros_like(T0)
    t0, t1, ac = T0, T1, acc
    for ck in coeffs:
        t2 = 2.0 * (sc * dia_matvec_reference(dia_j, t1, offs) - sh * t1) \
            - t0
        ac = ac + ck * t2
        t0, t1 = t1, t2

    plan = cheb_plan(offs, N, M)
    dgh, dgl = pack_diags(dia_j, plan)
    t0h, t0l = pack_state(T0, plan)
    t1h, t1l = pack_state(T1, plan)
    ah, al = pack_state(acc, plan)
    carry = cheb_ds_chunk(dgh, dgl, (t0h, t0l, t1h, t1l, ah, al),
                          jnp.asarray(coeffs, jnp.float32),
                          sc, sh, plan=plan, interpret=True)
    acc_k = unpack_state(carry[4], carry[5], N, M, plan)
    t1_k = unpack_state(carry[2], carry[3], N, M, plan)
    scale = float(jnp.abs(ac).max())
    # scalars/coeffs are f32-rounded in the kernel (benign: a perturbed
    # polynomial of the SAME matrix), so compare against the f64 oracle
    # rerun with the rounded scalars
    sc32, sh32 = float(np.float32(sc)), float(np.float32(sh))
    c32 = np.float32(coeffs)
    t0, t1, ac = T0, sc32 * dia_matvec_reference(dia_j, T0, offs) - sh32 * T0, acc
    for ck in c32:
        t2 = 2.0 * (sc32 * dia_matvec_reference(dia_j, t1, offs)
                    - sh32 * t1) - t0
        ac = ac + float(ck) * t2
        t0, t1 = t1, t2
    # kernel init carry used the UNROUNDED T1; rebuild with the same T1
    t0b, t1b, acb = T0, T1, acc
    for ck in c32:
        t2 = 2.0 * (sc32 * dia_matvec_reference(dia_j, t1b, offs)
                    - sh32 * t1b) - t0b
        acb = acb + float(ck) * t2
        t0b, t1b = t1b, t2
    err_acc = float(jnp.abs(acc_k - acb).max()) / max(scale, 1e-30)
    err_t = float(jnp.abs(t1_k - t1b).max()) / float(jnp.abs(t1b).max())
    assert err_acc < 1e-11
    assert err_t < 1e-11


@pytest.mark.parametrize("fixture", ["lap1d", "lap2d", "off_eq_block"])
@pytest.mark.parametrize("nsteps", [2, 14])
def test_cheb_two_step_chunks_match_oracle(fixture, nsteps):
    # the two-step-fused kernels (revolving VMEM scratch rings, margin-2
    # layout, 6 DS planes of HBM traffic per TWO steps) must agree with
    # the f64 oracle exactly like the 1-step kernels: DS to ~1e-11, f32
    # to f32 accumulation accuracy. Also covers the odd-history case
    # (nonzero initial acc exercises the acc aliasing).
    from feastkit_tpu.ops.cheb_pallas import (
        cheb_ds2_chunk, cheb_f32_2_chunk, pack_diags32, pack_state32,
        unpack_state32)
    if fixture == "lap1d":
        dia, offs = _lap_dia(300)
        N = 300
    elif fixture == "off_eq_block":
        N = 1024
        offs = (-256, -1, 0, 1, 256)
        rng0 = np.random.default_rng(7)
        dia = np.zeros((5, N))
        dia[2] = 4.0 + rng0.random(N)
        for k, d in zip((0, 1, 3, 4), (-256, -1, 1, 256)):
            if d > 0:
                dia[k, :N - d] = -rng0.random(N - d)
            else:
                dia[k, -d:] = -rng0.random(N + d)
    else:
        dia, offs = _lap2d_dia(18)
        N = 18 * 18
    M = 11
    rng = np.random.default_rng(1)
    Q = rng.standard_normal((N, M))
    lo_e, hi_e = -0.1, 8.1
    sc32 = float(np.float32(2.0 / (hi_e - lo_e)))
    sh32 = float(np.float32((hi_e + lo_e) / (hi_e - lo_e)))
    c32 = np.float32(rng.standard_normal(nsteps) * 0.1)

    dia_j = jnp.asarray(dia)
    T0 = jnp.asarray(Q)
    T1 = sc32 * dia_matvec_reference(dia_j, T0, offs) - sh32 * T0
    acc = 0.5 * T0
    t0b, t1b, acb = T0, T1, acc
    for ck in c32:
        t2 = 2.0 * (sc32 * dia_matvec_reference(dia_j, t1b, offs)
                    - sh32 * t1b) - t0b
        acb = acb + float(ck) * t2
        t0b, t1b = t1b, t2
    scale = max(float(jnp.abs(acb).max()), 1e-30)

    plan = cheb_plan(offs, N, M, margin=2)
    dgh, dgl = pack_diags(dia_j, plan)
    t0h, t0l = pack_state(T0, plan)
    t1h, t1l = pack_state(T1, plan)
    ah, al = pack_state(acc, plan)
    carry = cheb_ds2_chunk(dgh, dgl, (t0h, t0l, t1h, t1l, ah, al),
                           jnp.asarray(c32), sc32, sh32, plan=plan,
                           interpret=True)
    acc_k = unpack_state(carry[4], carry[5], N, M, plan)
    t1_k = unpack_state(carry[2], carry[3], N, M, plan)
    t0_k = unpack_state(carry[0], carry[1], N, M, plan)
    assert float(jnp.abs(acc_k - acb).max()) / scale < 1e-10
    assert float(jnp.abs(t1_k - t1b).max()) / float(
        jnp.abs(t1b).max()) < 1e-10
    assert float(jnp.abs(t0_k - t0b).max()) / float(
        jnp.abs(t0b).max()) < 1e-10

    dg = pack_diags32(dia_j, plan)
    out = cheb_f32_2_chunk(dg, (pack_state32(T0, plan),
                                pack_state32(T1, plan),
                                pack_state32(acc, plan)),
                           jnp.asarray(c32), sc32, sh32, plan=plan,
                           interpret=True)
    acc32 = unpack_state32(out[2], N, M, plan)
    assert float(jnp.abs(acc32 - acb).max()) / scale < 5e-4


@pytest.mark.parametrize("fixture", ["lap1d", "lap2d", "off_eq_block"])
@pytest.mark.parametrize("nsteps", [4, 12])
def test_cheb_four_step_chunks_match_oracle(fixture, nsteps):
    # the four-step-fused kernels (13-slot revolving rings, margin-4
    # layout, 6 DS planes of HBM traffic per FOUR steps) must agree with
    # the f64 oracle like the 1-/2-step kernels; the full carry
    # (T_{k}, T_{k+1}, acc) is checked so the ring bookkeeping across
    # the four levels cannot silently drift.
    from feastkit_tpu.ops.cheb_pallas import (
        cheb_ds4_chunk, cheb_f32_4_chunk, pack_diags32, pack_state32,
        unpack_state32)
    if fixture == "lap1d":
        dia, offs = _lap_dia(300)
        N = 300
    elif fixture == "off_eq_block":
        N = 1024
        offs = (-256, -1, 0, 1, 256)
        rng0 = np.random.default_rng(7)
        dia = np.zeros((5, N))
        dia[2] = 4.0 + rng0.random(N)
        for k, d in zip((0, 1, 3, 4), (-256, -1, 1, 256)):
            if d > 0:
                dia[k, :N - d] = -rng0.random(N - d)
            else:
                dia[k, -d:] = -rng0.random(N + d)
    else:
        dia, offs = _lap2d_dia(18)
        N = 18 * 18
    M = 11
    rng = np.random.default_rng(2)
    Q = rng.standard_normal((N, M))
    lo_e, hi_e = -0.1, 8.1
    sc32 = float(np.float32(2.0 / (hi_e - lo_e)))
    sh32 = float(np.float32((hi_e + lo_e) / (hi_e - lo_e)))
    c32 = np.float32(rng.standard_normal(nsteps) * 0.1)

    dia_j = jnp.asarray(dia)
    T0 = jnp.asarray(Q)
    T1 = sc32 * dia_matvec_reference(dia_j, T0, offs) - sh32 * T0
    acc = 0.5 * T0
    t0b, t1b, acb = T0, T1, acc
    for ck in c32:
        t2 = 2.0 * (sc32 * dia_matvec_reference(dia_j, t1b, offs)
                    - sh32 * t1b) - t0b
        acb = acb + float(ck) * t2
        t0b, t1b = t1b, t2
    scale = max(float(jnp.abs(acb).max()), 1e-30)

    plan = cheb_plan(offs, N, M, margin=4)
    dgh, dgl = pack_diags(dia_j, plan)
    t0h, t0l = pack_state(T0, plan)
    t1h, t1l = pack_state(T1, plan)
    ah, al = pack_state(acc, plan)
    carry = cheb_ds4_chunk(dgh, dgl, (t0h, t0l, t1h, t1l, ah, al),
                           jnp.asarray(c32), sc32, sh32, plan=plan,
                           interpret=True)
    acc_k = unpack_state(carry[4], carry[5], N, M, plan)
    t1_k = unpack_state(carry[2], carry[3], N, M, plan)
    t0_k = unpack_state(carry[0], carry[1], N, M, plan)
    assert float(jnp.abs(acc_k - acb).max()) / scale < 1e-10
    assert float(jnp.abs(t1_k - t1b).max()) / float(
        jnp.abs(t1b).max()) < 1e-10
    assert float(jnp.abs(t0_k - t0b).max()) / float(
        jnp.abs(t0b).max()) < 1e-10

    dg = pack_diags32(dia_j, plan)
    out = cheb_f32_4_chunk(dg, (pack_state32(T0, plan),
                                pack_state32(T1, plan),
                                pack_state32(acc, plan)),
                           jnp.asarray(c32), sc32, sh32, plan=plan,
                           interpret=True)
    acc32 = unpack_state32(out[2], N, M, plan)
    assert float(jnp.abs(acc32 - acb).max()) / scale < 5e-4


def test_cheb_two_step_chunks_on_margin4_layout():
    # the DS ladder may land on a margin-4 plan whose DS working set only
    # fits the TWO-step kernel (steps=4 fits f32 but not DS): the 2-step
    # chunks must run unchanged on the wider layout
    from feastkit_tpu.ops.cheb_pallas import cheb_ds2_chunk
    dia, offs = _lap_dia(300)
    N, M = 300, 7
    rng = np.random.default_rng(5)
    Q = rng.standard_normal((N, M))
    sc, sh = 0.5, 0.25
    c32 = np.float32(rng.standard_normal(6) * 0.1)
    dia_j = jnp.asarray(dia)
    T0 = jnp.asarray(Q)
    T1 = sc * dia_matvec_reference(dia_j, T0, offs) - sh * T0
    t0b, t1b, acb = T0, T1, jnp.zeros_like(T0)
    for ck in c32:
        t2 = 2.0 * (sc * dia_matvec_reference(dia_j, t1b, offs)
                    - sh * t1b) - t0b
        acb = acb + float(ck) * t2
        t0b, t1b = t1b, t2
    plan = cheb_plan(offs, N, M, margin=4)
    dgh, dgl = pack_diags(dia_j, plan)
    t0h, t0l = pack_state(T0, plan)
    t1h, t1l = pack_state(T1, plan)
    ah, al = pack_state(jnp.zeros_like(T0), plan)
    carry = cheb_ds2_chunk(dgh, dgl, (t0h, t0l, t1h, t1l, ah, al),
                           jnp.asarray(c32), sc, sh, plan=plan,
                           interpret=True)
    acc_k = unpack_state(carry[4], carry[5], N, M, plan)
    scale = max(float(jnp.abs(acb).max()), 1e-30)
    assert float(jnp.abs(acc_k - acb).max()) / scale < 1e-10


def test_cheb_one_step_kernels_on_margin2_layout():
    # the 1-step kernels must run unchanged on the margin-2 layout (the
    # init/odd-fixup steps of the two-step schedule drive them there):
    # the widened grid's extra margin centers compute exact zeros
    dia, offs = _lap_dia(300)
    N, M = 300, 7
    rng = np.random.default_rng(3)
    Q = rng.standard_normal((N, M))
    sc, sh = 0.5, 0.25
    c32 = np.float32(rng.standard_normal(6) * 0.1)
    dia_j = jnp.asarray(dia)
    T0 = jnp.asarray(Q)
    T1 = sc * dia_matvec_reference(dia_j, T0, offs) - sh * T0
    t0b, t1b, acb = T0, T1, jnp.zeros_like(T0)
    for ck in c32:
        t2 = 2.0 * (sc * dia_matvec_reference(dia_j, t1b, offs)
                    - sh * t1b) - t0b
        acb = acb + float(ck) * t2
        t0b, t1b = t1b, t2
    plan = cheb_plan(offs, N, M, margin=2)
    dgh, dgl = pack_diags(dia_j, plan)
    t0h, t0l = pack_state(T0, plan)
    t1h, t1l = pack_state(T1, plan)
    ah, al = pack_state(jnp.zeros_like(T0), plan)
    carry = cheb_ds_chunk(dgh, dgl, (t0h, t0l, t1h, t1l, ah, al),
                          jnp.asarray(c32), sc, sh, plan=plan,
                          interpret=True)
    acc_k = unpack_state(carry[4], carry[5], N, M, plan)
    scale = max(float(jnp.abs(acb).max()), 1e-30)
    assert float(jnp.abs(acc_k - acb).max()) / scale < 1e-10


def test_cheb_f32_chunk_matches_f64_at_f32_precision():
    # the fused single-f32 kernel agrees with the f64 recurrence to f32
    # accumulation accuracy (same math, fused rounding order)
    from feastkit_tpu.ops.cheb_pallas import (cheb_f32_chunk, pack_diags32,
                                              pack_state32, unpack_state32)
    dia, offs = _lap2d_dia(18)
    N, M = 18 * 18, 11
    rng = np.random.default_rng(2)
    Q = rng.standard_normal((N, M))
    lo_e, hi_e = -0.1, 8.1
    sc32 = float(np.float32(2.0 / (hi_e - lo_e)))
    sh32 = float(np.float32((hi_e + lo_e) / (hi_e - lo_e)))
    coeffs = np.float32(rng.standard_normal(12) * 0.1)
    dia_j = jnp.asarray(dia)
    T0 = jnp.asarray(Q)
    T1 = sc32 * dia_matvec_reference(dia_j, T0, offs) - sh32 * T0
    acc = jnp.zeros_like(T0)
    t0, t1, ac = T0, T1, acc
    for ck in coeffs:
        t2 = 2.0 * (sc32 * dia_matvec_reference(dia_j, t1, offs)
                    - sh32 * t1) - t0
        ac = ac + float(ck) * t2
        t0, t1 = t1, t2
    plan = cheb_plan(offs, N, M)
    dg = pack_diags32(dia_j, plan)
    carry = (jnp.zeros((plan["Mp"], plan["N_tot"]), jnp.float32)
             .at[:, :].set(0.0),)
    c0 = pack_state32(T0, plan)
    c1 = pack_state32(T1, plan)
    ca = pack_state32(acc, plan)
    out = cheb_f32_chunk(dg, (c0, c1, ca), jnp.asarray(coeffs),
                         sc32, sh32, plan=plan, interpret=True)
    acc_k = unpack_state32(out[2], N, M, plan)
    err = float(jnp.abs(acc_k - ac).max() / jnp.abs(ac).max())
    assert err < 5e-5


def test_cheb_plan_fits_vmem_gate():
    from feastkit_tpu.ops.cheb_pallas import cheb_plan_fits
    # 1D and the 1M-dof 2D north-star fit
    assert cheb_plan_fits((-1, 0, 1), 1000, 72)
    assert cheb_plan_fits((-1024, -1, 0, 1, 1024), 1 << 20, 72)
    # a large 3D Laplacian's +-nx^2 offsets force lane blocks whose
    # double-buffered planes exceed VMEM -> unfused fallback
    assert not cheb_plan_fits((-160000, -400, -1, 0, 1, 400, 160000),
                              64_000_000, 72)
    # per-kernel sizing: a small-M0 operator in the window where the f32
    # kernel (7 planes + diag) fits but the DS kernel (14 + 2 diag) does
    # not — the f32 rung stays fused while DS falls back. (Window sized
    # to the 32 MB model budget that goes with the kernels' 64 MB
    # vmem_limit_bytes.)
    offs = (-35600, 0, 35600)
    assert cheb_plan_fits(offs, 1_000_000, 8, ds=False)
    assert not cheb_plan_fits(offs, 1_000_000, 8, ds=True)


def test_cheb_fused_gate_falls_back_unfused(monkeypatch, capsys):
    # when the VMEM gate rejects the operator, the ladder still runs
    # through the UNFUSED f32/f64 chunked path and converges identically
    import scipy.sparse as sp
    from feastkit_tpu import feastinit
    from feastkit_tpu.ops import cheb_pallas
    from feastkit_tpu.solvers.sparse import feast_scsrev
    monkeypatch.setattr(cheb_pallas, "cheb_plan_fits",
                        lambda *a, **k: False)
    monkeypatch.setenv("FEAST_CHEB_DS", "1")
    n = 300
    A = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr")
    w = 2.0 - 2.0 * np.cos(np.arange(1, n + 1) * np.pi / (n + 1))
    exp = np.sort(w[w <= 0.01])
    fpm = feastinit()
    fpm[1] = 1
    fpm[3] = 8
    fpm[42] = 2
    r = feast_scsrev(A, 0.0, 0.01, len(exp) + 4, fpm, solver="cheb")
    out = capsys.readouterr().out
    assert "ds recurrence" not in out
    assert "f32 recurrence" in out
    assert r.info == 0 and r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-9


def test_cheb_ds_end_to_end_ladder(monkeypatch, capsys):
    # FEAST_CHEB_DS=1 forces the fused DS kernel rung (interpret mode
    # off-TPU); with fpm[42]=2 the precision ladder is f32 -> DS -> f64.
    # Since the acc-init lo-plane fix the DS rung is f64-grade on this
    # fixture (floor ~5e-14, three decades below the pre-fix 2.5e-9), so
    # tol=1e-13 converges ON the DS rung with no f64 loop at all.
    import scipy.sparse as sp
    from feastkit_tpu import feastinit
    from feastkit_tpu.solvers.sparse import feast_scsrev
    n = 300
    A = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr")
    w = 2.0 - 2.0 * np.cos(np.arange(1, n + 1) * np.pi / (n + 1))
    exp = np.sort(w[w <= 0.01])
    fpm = feastinit()
    fpm[1] = 1
    fpm[3] = 13
    fpm[42] = 2
    monkeypatch.setenv("FEAST_CHEB_DS", "1")
    r = feast_scsrev(A, 0.0, 0.01, len(exp) + 4, fpm, solver="cheb")
    out = capsys.readouterr().out
    assert "f32 recurrence" in out
    assert "ds recurrence" in out
    assert "f64 recurrence" not in out    # DS rung suffices post-fix
    assert r.info == 0
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-13
    assert r.res.max() < 1e-13


def test_cheb_ladder_falls_through_on_ds_stall(monkeypatch, capsys):
    # The DS -> f64 fall-through mechanism: degrade the DS rung to a hard
    # ~1e-8 noise floor (the pre-fix behavior, or a future kernel bug) and
    # assert the ladder detects the stall, switches to the f64 rung, and
    # still lands the 1e-13 tolerance.
    import scipy.sparse as sp
    from feastkit_tpu import feastinit
    import feastkit_tpu.solvers.sparse as sparse_mod
    from feastkit_tpu.solvers.sparse import feast_scsrev
    n = 300
    A = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr")
    w = 2.0 - 2.0 * np.cos(np.arange(1, n + 1) * np.pi / (n + 1))
    exp = np.sort(w[w <= 0.01])
    fpm = feastinit()
    fpm[1] = 1
    fpm[3] = 13
    fpm[42] = 2
    monkeypatch.setenv("FEAST_CHEB_DS", "1")
    orig = sparse_mod._sparse_cheb_filter_host_fused

    def degraded(ctx, Q, nnz, *, ds, n_coeffs=None):
        out = orig(ctx, Q, nnz, ds=ds, n_coeffs=n_coeffs)
        if ds:
            rng = np.random.default_rng(7)
            noise = jnp.asarray(rng.standard_normal(out.shape))
            out = out + (1e-8 * float(jnp.abs(out).max())) * noise
        return out

    monkeypatch.setattr(sparse_mod, "_sparse_cheb_filter_host_fused",
                        degraded)
    r = feast_scsrev(A, 0.0, 0.01, len(exp) + 4, fpm, solver="cheb")
    out = capsys.readouterr().out
    assert "ds recurrence" in out
    assert "switching to f64" in out
    assert "f64 recurrence" in out
    assert r.info == 0
    assert r.M == len(exp)
    assert np.abs(np.sort(r.lam) - exp).max() < 1e-13
    assert r.res.max() < 1e-13


def test_cheb_ds_suffices_at_1e8(monkeypatch, capsys):
    # at the north-star tolerance the DS rung alone must close the run —
    # no f64 recurrence loop at all (the schedule the chip actually runs)
    import scipy.sparse as sp
    from feastkit_tpu import feastinit
    from feastkit_tpu.solvers.sparse import feast_scsrev
    n = 300
    A = sp.diags([2.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1)],
                 [0, 1, -1], format="csr")
    w = 2.0 - 2.0 * np.cos(np.arange(1, n + 1) * np.pi / (n + 1))
    exp = np.sort(w[w <= 0.01])
    fpm = feastinit()
    fpm[1] = 1
    fpm[3] = 8
    fpm[42] = 2
    monkeypatch.setenv("FEAST_CHEB_DS", "1")
    r = feast_scsrev(A, 0.0, 0.01, len(exp) + 4, fpm, solver="cheb")
    out = capsys.readouterr().out
    assert "ds recurrence" in out
    assert "f64 recurrence" not in out
    assert r.info == 0
    assert r.M == len(exp)
    assert r.res.max() < 1e-8


def _fem_pencil_1d(n):
    """1D stiffness/consistent-mass pair in row-aligned DIA, mass scaled
    to unit diagonal (entries 1, 1/4 -> kappa(B) ~ 3)."""
    h = 1.0 / (n + 1)
    dA = np.zeros((3, n))
    dA[0, 1:] = -1.0 / h
    dA[1] = 2.0 / h
    dA[2, :-1] = -1.0 / h
    dB = np.zeros((3, n))
    dB[0, 1:] = 0.25
    dB[1] = 1.0
    dB[2, :-1] = 0.25
    return dA, dB, (-1, 0, 1)


def _gen_oracle(dAj, dBj, offs, qc32, scals, Q, coeffs):
    """f64 composite recurrence with f32-rounded scalars (what the fused
    kernels compute, at DS precision)."""
    scB, shB = scals["scB"], scals["shB"]
    sc_C, sh_C = scals["sc_C"], scals["sh_C"]

    def qB(y):
        t0 = y
        t1 = scB * dia_matvec_reference(dBj, y, offs) - shB * y
        acc = float(qc32[0]) * t0 + float(qc32[1]) * t1
        for ck in qc32[2:]:
            t2 = 2.0 * (scB * dia_matvec_reference(dBj, t1, offs)
                        - shB * t1) - t0
            acc = acc + float(ck) * t2
            t0, t1 = t1, t2
        return acc

    def chat(x):
        return sc_C * qB(dia_matvec_reference(dAj, x, offs)) - sh_C * x

    T0 = jnp.asarray(Q)
    T1 = chat(T0)
    acc = float(coeffs[0]) * T0 + float(coeffs[1]) * T1
    for ck in coeffs[2:]:
        T2 = 2.0 * chat(T1) - T0
        acc = acc + float(ck) * T2
        T0, T1 = T1, T2
    return acc, T1


def _gen_setup(n=300, M=9, seed=0):
    from feastkit_tpu.ops.chebfilter import (binva_enclosure,
                                             cheb_inverse_coeffs,
                                             gershgorin_interval)
    dA, dB, offs = _fem_pencil_1d(n)
    b_lo, b_hi = 0.49, 1.51
    qc, _ = cheb_inverse_coeffs(b_lo, b_hi, 1e-12)
    rows, cols, vals = [], [], []
    for k, off in enumerate(offs):
        for i in range(n):
            j = i + off
            if 0 <= j < n and dA[k, i] != 0.0:
                rows.append(i), cols.append(j), vals.append(dA[k, i])
    a_lo, a_hi = gershgorin_interval(
        np.array(vals), np.array(list(zip(rows, cols))), n)
    clo, chi = binva_enclosure(a_lo, a_hi, b_lo, b_hi, 1e-12)
    scals = dict(sc_C=float(np.float32(2.0 / (chi - clo))),
                 sh_C=float(np.float32((chi + clo) / (chi - clo))),
                 scB=float(np.float32(2.0 / (b_hi - b_lo))),
                 shB=float(np.float32((b_hi + b_lo) / (b_hi - b_lo))))
    rng = np.random.default_rng(seed)
    Q = rng.standard_normal((n, M))
    coeffs = np.float32(rng.standard_normal(11) * 0.1)
    return (jnp.asarray(dA), jnp.asarray(dB), offs, np.float32(qc), scals,
            Q, coeffs)


def test_cheb_gen_chunk_ds_matches_f64():
    """Fused generalized (SPD B) recurrence == f64 oracle at DS precision.

    Runs the WHOLE chain jit-compiled: XLA-level DS glue silently loses
    the lo plane to backend FMA contraction (the bug this layout was
    rewritten to exclude), so DS-level agreement under jit proves every
    EFT op lives inside a kernel."""
    from feastkit_tpu.ops.cheb_pallas import (cheb_gen_chunk, cheb_gen_init,
                                              cheb_gen_plan, pack_diags,
                                              pack_state, unpack_state)
    dAj, dBj, offs, qc32, scals, Q, coeffs = _gen_setup()
    n, M = Q.shape
    acc_o, t1_o = _gen_oracle(dAj, dBj, offs, qc32, scals, Q, coeffs)
    plan = cheb_gen_plan(offs, offs, n, M)
    dgA = pack_diags(dAj, plan)
    dgB = pack_diags(dBj, plan)
    Qp = pack_state(jnp.asarray(Q), plan)

    def run(dgA, dgB, qc, Qp, c01, ctail):
        carry = cheb_gen_init(dgA, dgB, qc, Qp, c01, scals, plan=plan,
                              ds=True, interpret=True)
        return cheb_gen_chunk(dgA, dgB, qc, carry, ctail, scals,
                              plan=plan, ds=True, interpret=True)

    carry = jax.jit(run)(dgA, dgB, jnp.asarray(qc32), Qp,
                         jnp.asarray(coeffs[:2]), jnp.asarray(coeffs[2:]))
    acc_k = unpack_state(carry[4], carry[5], n, M, plan)
    t1_k = unpack_state(carry[2], carry[3], n, M, plan)
    scale = float(jnp.abs(acc_o).max())
    assert float(jnp.abs(acc_k - acc_o).max()) / scale < 1e-11
    assert (float(jnp.abs(t1_k - t1_o).max())
            / float(jnp.abs(t1_o).max())) < 1e-11


def test_cheb_gen_chunk_inner4_matches_f64():
    # the four-step inner Clenshaw (margin-4 gen plan, inner_steps=4)
    # must agree with the f64 oracle exactly like the two-step inner,
    # including the zero-padded quad tail (m_B - 1 not a multiple of 4)
    from feastkit_tpu.ops.cheb_pallas import (cheb_gen_chunk, cheb_gen_init,
                                              cheb_gen_plan, pack_diags,
                                              pack_diags32, pack_state,
                                              pack_state32, unpack_state,
                                              unpack_state32)
    dAj, dBj, offs, qc32, scals, Q, coeffs = _gen_setup()
    n, M = Q.shape
    acc_o, t1_o = _gen_oracle(dAj, dBj, offs, qc32, scals, Q, coeffs)
    plan = cheb_gen_plan(offs, offs, n, M, margin=4)
    dgA = pack_diags(dAj, plan)
    dgB = pack_diags(dBj, plan)
    Qp = pack_state(jnp.asarray(Q), plan)
    carry = cheb_gen_init(dgA, dgB, jnp.asarray(qc32), Qp,
                          jnp.asarray(coeffs[:2]), scals, plan=plan,
                          ds=True, inner_steps=4, interpret=True)
    carry = cheb_gen_chunk(dgA, dgB, jnp.asarray(qc32), carry,
                           jnp.asarray(coeffs[2:]), scals, plan=plan,
                           ds=True, inner_steps=4, interpret=True)
    acc_k = unpack_state(carry[4], carry[5], n, M, plan)
    t1_k = unpack_state(carry[2], carry[3], n, M, plan)
    scale = float(jnp.abs(acc_o).max())
    assert float(jnp.abs(acc_k - acc_o).max()) / scale < 1e-11
    assert (float(jnp.abs(t1_k - t1_o).max())
            / float(jnp.abs(t1_o).max())) < 1e-11

    dg32A = pack_diags32(dAj, plan)
    dg32B = pack_diags32(dBj, plan)
    Qp32 = pack_state32(jnp.asarray(Q), plan)
    c = cheb_gen_init(dg32A, dg32B, jnp.asarray(qc32), Qp32,
                      jnp.asarray(coeffs[:2]), scals, plan=plan, ds=False,
                      inner_steps=4, interpret=True)
    c = cheb_gen_chunk(dg32A, dg32B, jnp.asarray(qc32), c,
                       jnp.asarray(coeffs[2:]), scals, plan=plan, ds=False,
                       inner_steps=4, interpret=True)
    acc32 = unpack_state32(c[2], n, M, plan)
    err = float(jnp.abs(acc32 - acc_o).max()) / scale
    assert err < 1e-4


def test_cheb_gen_chunk_f32_matches_f64_at_f32():
    from feastkit_tpu.ops.cheb_pallas import (cheb_gen_chunk, cheb_gen_init,
                                              cheb_gen_plan, pack_diags32,
                                              pack_state32, unpack_state32)
    dAj, dBj, offs, qc32, scals, Q, coeffs = _gen_setup()
    n, M = Q.shape
    acc_o, _ = _gen_oracle(dAj, dBj, offs, qc32, scals, Q, coeffs)
    plan = cheb_gen_plan(offs, offs, n, M)
    dgA = pack_diags32(dAj, plan)
    dgB = pack_diags32(dBj, plan)
    Qp = pack_state32(jnp.asarray(Q), plan)
    c = cheb_gen_init(dgA, dgB, jnp.asarray(qc32), Qp,
                      jnp.asarray(coeffs[:2]), scals, plan=plan, ds=False,
                      interpret=True)
    c = cheb_gen_chunk(dgA, dgB, jnp.asarray(qc32), c,
                       jnp.asarray(coeffs[2:]), scals, plan=plan, ds=False,
                       interpret=True)
    acc_k = unpack_state32(c[2], n, M, plan)
    err = float(jnp.abs(acc_k - acc_o).max()) / float(jnp.abs(acc_o).max())
    assert err < 1e-4


def test_ds_glue_in_xla_is_unsafe_documented():
    """The hazard itself: the same _ds_mul_f32 that is exact in-kernel
    LOSES the lo plane when XLA jit-compiles it at the top level (backend
    FMA contraction double-counts the two_prod error). This pins the
    behavior the in-kernel-only policy guards against; if it ever starts
    passing, the policy can be relaxed."""
    from feastkit_tpu.ops.cheb_pallas import _ds_mul_f32
    rng = np.random.default_rng(1)
    x64 = rng.standard_normal(4096)
    xh = jnp.asarray(x64.astype(np.float32))
    xl = jnp.asarray((x64 - np.float64(x64.astype(np.float32))
                      ).astype(np.float32))
    c = np.float32(1.7320508)
    truth = np.asarray(x64) * np.float64(c)

    def err(pair):
        v = (np.asarray(pair[0], np.float64)
             + np.asarray(pair[1], np.float64))
        return np.abs(v - truth).max() / np.abs(truth).max()

    assert err(_ds_mul_f32(xh, xl, c)) < 1e-13          # eager: exact
    jit_err = err(jax.jit(_ds_mul_f32)(xh, xl, c))
    assert jit_err < 1e-6                               # sanity: still f32
