"""Benchmark harness: Cartesian masked ADI step throughput on one chip.

Prints exactly ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: ADI cell-updates/sec/chip at the largest grid that fits (target 512^3,
float32), on a realistic masked WAAM configuration (solid plate + deposited
block, Robin on all faces — the WAAM flagship BC set).

vs_baseline: fraction of the HBM-bandwidth "speed of light" for this
algorithm (the reference publishes no numbers — BASELINE.md — so the roofline
is the recorded baseline protocol).  Traffic model for a perfectly fused
step, per cell: explicit pass reads T(4B)+mask(1B) and writes R0(4B) = 9B;
each of the 3 sweeps reads rhs(4B)+mask(1B)+robin coeff(4B) and writes its
output(4B) = 13B; total 48 B/cell/step.  v5e HBM ~819 GB/s => SOL ~17.1e9
cell-updates/s.  vs_baseline > 1 is impossible; higher is better.
"""
import functools
import json
import sys
import time

import numpy as np

HBM_BYTES_PER_S = 819e9      # TPU v5e per-chip HBM bandwidth
TRAFFIC_B_PER_CELL = 48.0    # see module docstring
SOL_CELLS_PER_S = HBM_BYTES_PER_S / TRAFFIC_B_PER_CELL
VARPROP_B_PER_CELL = 117.0       # derivation at main_varprop
CYL_VARPROP_B_PER_CELL = 45.0    # derivation at main_cyl_varprop


def probe_compile_service():
    """One tiny fresh compile, timed: the remote compile service has
    degraded windows (~180+ s per trivial program, NOTES.md) during which
    wall-clock results are polluted by compile time.  Kernel *steady-state*
    timing below excludes compiles, but a degraded service also correlates
    with tunnel contention — record the probe so every BENCH number carries
    its environment health."""
    import time as _t

    import jax
    import jax.numpy as jnp
    x = jnp.full((64, 64, 64), 1.5, jnp.float32)
    t0 = _t.perf_counter()
    f = jax.jit(lambda x: jnp.tanh(x) @ jnp.swapaxes(x, 1, 2) + 0.5)
    float(f(x).sum())
    el = _t.perf_counter() - t0
    print(f"[bench] compile probe {el:.1f} s "
          f"({'HEALTHY' if el < 30 else 'DEGRADED — timings suspect'})",
          file=sys.stderr)
    return el


def _timed_median(step_loop, steps, repeats=3):
    """Median-of-``repeats`` per-step time, measured as the SLOPE between a
    short and a long loop.

    The axon tunnel adds a fixed ~25-30 ms round trip to every synchronized
    timing (dispatch + final scalar fetch), independent of the program: a
    40-step x+1.0 loop on 8.4M cells and a 10-step one both complete in
    ~30 ms wall (measured round 3).  Naive T/steps therefore inflates every
    per-step number by ~30ms/steps — at steps=10 that overstated the masked
    cylindrical step by ~3 ms/step and led round 3 to misdiagnose
    DMA-bound kernels as issue-bound.  The slope (T(steps) - T(steps/4)) /
    (steps - steps/4) cancels any fixed offset exactly.  Median-of-repeats
    on the slope; run-to-run tunnel variance is 10-15% (NOTES.md)."""
    k_small = max(1, steps // 4)
    step_loop(k_small)   # warm-up: the first timed loop otherwise carries
    # residual compile/donation setup (observed as a negative first slope)
    times = []
    offs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        step_loop(k_small)
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        step_loop(steps)
        t_big = time.perf_counter() - t0
        times.append((t_big - t_small) / (steps - k_small))
        offs.append(t_small - k_small * times[-1])
    med = sorted(times)[len(times) // 2]
    print(f"[bench] slope repeats: "
          f"{', '.join(f'{t * 1e3:.2f}' for t in times)} ms/step -> "
          f"median {med * 1e3:.2f} "
          f"(spread {(max(times) - min(times)) / med * 100:.0f}%, "
          f"fixed tunnel offset ~{sorted(offs)[len(offs) // 2] * 1e3:.0f} ms)",
          file=sys.stderr)
    return med


def build_case(n, dtype, lite=False):
    import jax.numpy as jnp

    from adi_thermal_fields_tpu import (CartesianGrid, Material,
                                        build_coeff_packs)

    nx, ny, nz = (n, n, n) if isinstance(n, int) else n
    grid = CartesianGrid(nx, ny, nz, 1e-3)
    mat = Material(7800.0, 490.0, 54.0)
    zsplit = (3 * nz) // 4
    mask_np = np.ones(grid.shape, bool)
    mask_np[:, :, zsplit:] = False
    mask_np[nx // 4: 3 * nx // 4, ny // 4: 3 * ny // 4,
            zsplit: zsplit + nz // 8] = True
    mask = jnp.asarray(mask_np)
    T = jnp.where(mask, 900.0, 20.0).astype(dtype)
    # Robin-only BCs: the flagship WAAM configuration (the reference's WAAM
    # driver applies convective h on all faces and nothing else,
    # waam_from_stl_v7_mm.py:446-455).  The plan-lite path derives the Robin
    # sink in-kernel, so it needs no coefficient packs at all — skipping them
    # frees ~28 B/cell of HBM and lifts the single-chip capacity ceiling
    # (640^3 fits lite but OOMs with packs resident).
    packs = (None if lite else
             build_coeff_packs(mask, grid, mat, robin_h=200.0, dtype=dtype))
    return grid, mat, T, mask, packs


def run(n, steps=20, dtype=None, implementation="pallas"):
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    from adi_thermal_fields_tpu import adi_step_cartesian
    from adi_thermal_fields_tpu.step.cartesian_pallas import (adi_step_pallas,
                                                              build_sweep_plan)

    grid, mat, T, mask, packs = build_case(n, dtype,
                                           lite=implementation == "pallas")

    if implementation == "pallas":
        from adi_thermal_fields_tpu.step.cartesian_pallas import pad_domain

        # plan-lite: scalar-h Robin (the flagship WAAM BC set) derives the
        # per-axis sink in-kernel from the sweep code — no coeff fields.
        # pad_to_tile keeps the whole domain at kernel-tile-friendly dims
        # (no-op at 512^3; 2x at 576^3 where per-call pads dominate)
        rob_c = 200.0 / (mat.rho * mat.cp * grid.dx)
        plan = jax.jit(lambda m: build_sweep_plan(
            m, None, has_neumann=False, has_dirichlet=False,
            robin_const=rob_c, pad_to_tile=True))(mask)
        T = jax.jit(pad_domain)(T)  # once; the state then stays padded

        # donate the state: a stepping loop never reuses the old T, and the
        # aliasing buys the headroom that lets 768^3 run on one chip
        @functools.partial(jax.jit, donate_argnums=0)
        def step(T, plan, packs, dt):
            return adi_step_pallas(T, plan, grid, mat, dt=dt, theta=0.5,
                                   t_inf=20.0)

        mask = plan  # positional reuse below
    else:
        @jax.jit
        def step(T, mask, packs, dt):
            return adi_step_cartesian(T, mask, packs, grid, mat, dt=dt,
                                      theta=0.5, t_inf=20.0)

    # NOTE: on the remote-tunnel (axon) platform block_until_ready() can
    # return before execution completes; pulling a scalar that depends on the
    # whole step chain is the reliable synchronization.
    probe = jax.jit(lambda x: jnp.sum(x[::64, ::64, ::64]))

    dt = jnp.asarray(0.05, dtype)
    T = step(jnp.copy(T), mask, packs, dt)
    float(probe(T))  # compile + warm-up both programs

    def loop(k, T0=T):
        # the pallas step donates its state, so each repeat steps a fresh
        # copy (one device-to-device copy per timed loop, ~0.02 ms/step
        # amortized at 512^3)
        T = jnp.copy(T0)
        for _ in range(k):
            T = step(T, mask, packs, dt)
        float(probe(T))
        assert bool(jnp.isfinite(T).all()), "non-finite field in bench run"

    el = _timed_median(loop, steps)
    return grid.ncells / el, el


def run_cylindrical(shape=(128, 512, 512), steps=40, dtype=None):
    """Cylindrical BE step throughput (pallas r/z sweeps + cyclic phi)."""
    import jax
    import jax.numpy as jnp

    from adi_thermal_fields_tpu import CylindricalGrid, Material, RobinBC, ZFaceBC
    from adi_thermal_fields_tpu.step.cylindrical import adi_step

    dtype = dtype or jnp.float32
    nr, nphi, nz = shape
    grid = CylindricalGrid(nr, nphi, nz, 5e-4, 5e-4, r_inner=0.02)
    mat = Material(7800.0, 490.0, 54.0)
    robin = RobinBC(300.0, 20.0)
    zbc = ZFaceBC(kind_top="robin", h_top=400.0, T_inf_top=20.0)

    @jax.jit
    def step(T, dt):
        return adi_step(T, grid, mat, dt=dt, robin_outer=robin, zbc=zbc,
                        implementation="pallas")

    probe = jax.jit(lambda x: jnp.sum(x[::32, ::64, ::64]))
    T = jnp.full(shape, 900.0, dtype)
    dt = jnp.asarray(0.02, dtype)
    T = step(T, dt)
    float(probe(T))

    def loop(k, T=T):
        for _ in range(k):
            T = step(T, dt)
        float(probe(T))
        assert bool(jnp.isfinite(T).all())

    el = _timed_median(loop, steps)
    return nr * nphi * nz / el, el


def emit(metric, value, bytes_per_cell):
    """One JSON record per case.  ``vs_baseline`` stays the fraction of the
    per-case traffic-model roofline (self-declared B/cell), and because such
    models are not comparable across cases (VERDICT r3 #6) the record also
    carries the model itself plus the ABSOLUTE apparent bandwidth in GB/s
    and as a percentage of the v5e's 819 GB/s HBM."""
    v = value or 0.0
    if not v and _DEFER_ZERO:
        # first-pass failure under main_all: hold the zero record — the
        # case gets a second chance after the sweep (FAILED_PRECONDITION
        # patches are transient: observed twice on 2026-08-21, mid-run
        # cases zeroed while the final case succeeded)
        _DEFERRED.append((metric, bytes_per_cell))
        return
    gbps = v * bytes_per_cell / 1e9
    print(json.dumps({
        "metric": metric,
        "value": v,
        "unit": "cell/s",
        "vs_baseline": gbps * 1e9 / HBM_BYTES_PER_S,
        "model_B_per_cell": bytes_per_cell,
        "abs_GB_per_s": round(gbps, 1),
        "pct_of_hbm_819": round(gbps * 1e11 / HBM_BYTES_PER_S, 1),
    }), flush=True)


def _retry_shapes(fn, shapes, label):
    """Run ``fn(shape)`` with per-shape retries (the remote compile service
    is flaky); returns (value, shape) for the first shape that succeeds."""
    for shape in shapes:
        for attempt in range(3):
            try:
                value, per_step = fn(shape)
                print(f"[bench] {label} {shape}: {per_step * 1e3:.2f} ms/step"
                      f" -> {value / 1e9:.3f} Gcell/s", file=sys.stderr)
                return value, shape
            except Exception as e:
                print(f"[bench] {label} {shape} attempt {attempt}: "
                      f"{type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
    return None, shapes[-1]


def main_cylindrical():
    # cylindrical-step traffic model: r/z fused const-coeff sweeps are
    # 8 B/cell each (read rhs + write x), the cyclic phi solve 8 B/cell +
    # fac read ~0: ~24 B/cell/step.  TRUE since round 4 — the z solve now
    # runs in the natural layout (Z_NAT_CONST_DEFAULT; its moveaxis pair
    # silently added 16 B/cell before, making the old "24 B" optimistic).
    value, shape = _retry_shapes(run_cylindrical,
                                 ((128, 512, 512), (64, 256, 256)), "cyl")
    emit(f"cyl_adi_cell_updates_per_s_per_chip_{shape}_f32", value, 24.0)


def main_bf16():
    """bf16-state / f32-solve bandwidth mode (opt-in; ~24 B/cell/step —
    half the 48 B f32 model, pessimistic vs the 17.5 B fused model)."""
    import jax.numpy as jnp

    value, n = _retry_shapes(lambda n: run(n, dtype=jnp.bfloat16),
                             (512, 384, 256), "bf16")
    emit(f"adi_cell_updates_per_s_per_chip_{n}^3_bf16", value, 24.0)


def run_masked_cylindrical(shape=(64, 512, 256), steps=60, dtype=None):
    """Masked-Robin cylindrical step (element birth; field-coefficient
    fused kernels) on a part-deposited geometry."""
    import jax
    import jax.numpy as jnp

    from adi_thermal_fields_tpu import (CylindricalGrid, Material, RobinBC,
                                        ZFaceBC)
    from adi_thermal_fields_tpu.step.cylindrical_masked import (
        adi_step_masked_robin)

    dtype = dtype or jnp.float32
    nr, nphi, nz = shape
    grid = CylindricalGrid(nr, nphi, nz, 5e-4, 5e-4, r_inner=0.02)
    mat = Material(7800.0, 490.0, 54.0)
    rob = RobinBC(300.0, 20.0)
    zbc = ZFaceBC(kind_top="robin", h_top=400.0, T_inf_top=20.0)
    act = np.zeros(shape, bool)
    act[:, :, :nz // 2] = True
    act[:, :(3 * nphi) // 5, nz // 2:nz // 2 + nz // 8] = True
    active = jnp.asarray(act)

    from adi_thermal_fields_tpu.step.cylindrical_masked import (
        build_masked_robin_plan, masked_robin_solve)

    # production pattern (engine/WAAM): the plan is rebuilt only on element
    # BIRTH events (every ~10^2-10^3 steps), so steady-state throughput is
    # plan-prebuilt masked_robin_solve.  adi_step_masked_robin = plan build
    # + solve fused in one call; timed separately below for the record.
    plan = jax.jit(functools.partial(
        build_masked_robin_plan, grid, mat, robin_outer=rob, zbc=zbc,
        robin_inner=rob, h_void=80.0, dtype=dtype))(active)

    @jax.jit
    def step(T, plan, dt):
        return masked_robin_solve(T, plan, grid, mat, dt=dt,
                                  implementation="pallas")

    probe = jax.jit(lambda x: jnp.sum(x[::16, ::64, ::64]))
    T = jnp.where(active, 900.0, 20.0).astype(dtype)
    dt = jnp.asarray(0.02, dtype)
    T = step(T, plan, dt)
    float(probe(T))

    def loop(k, T=T):
        for _ in range(k):
            T = step(T, plan, dt)
        float(probe(T))
        assert bool(jnp.isfinite(T).all())

    el = _timed_median(loop, steps)
    return nr * nphi * nz / el, el


def main_masked():
    # traffic model (compressed masked kernels, round 4): the prefold and
    # the final ambient-select are folded IN-KERNEL (code bits 4/8 +
    # streamed srhs), the phi solve runs as an axis-1 cyclic kernel in the
    # natural layout, and the z sweep reads/writes the NATURAL layout via
    # in-kernel chunk relayout — per sweep = read rhs+code+sink+srhs
    # (13 B) + write x (4 B) = 17 B, ZERO transpose pairs: ~51 B/cell/step
    # (round 3: 59 with the z pair; round 2: ~120 with XLA prefolds).
    # (64, 512, 1024) = 33.5M cells: large enough that fixed overheads
    # cannot pollute the rate (VERDICT r2 #2); the 8.4M shape is kept for
    # round-over-round comparability
    value, shape = _retry_shapes(
        run_masked_cylindrical,
        ((64, 512, 1024), (64, 512, 256), (32, 256, 128)), "masked-cyl")
    emit(f"masked_cyl_cell_updates_per_s_per_chip_{shape}_f32", value, 51.0)


def run_varprop(n, steps=40, dtype=None):
    """Variable-property step (latent heat via apparent cp + melt-pool
    enhanced k + radiative film): the physics WAAM actually runs at
    1500 C, through the engine's varprop branch."""
    import jax
    import jax.numpy as jnp

    from adi_thermal_fields_tpu.apps.engine import make_cartesian_engine
    from adi_thermal_fields_tpu.step.cartesian_varprop import (
        apparent_cp, melt_pool_enhanced_k)

    dtype = dtype or jnp.float32
    grid, mat, T, mask, _ = build_case(n, dtype, lite=True)
    kt = melt_pool_enhanced_k(mat.k, 1420.0, 1470.0, enhancement=4.0)
    ct = apparent_cp(mat.cp, mat.cp, 2.7e5, 1420.0, 1470.0)
    prepare, advance = make_cartesian_engine(
        grid, mat, robin_h=15.0, t_inf=20.0, dtype=dtype, emissivity=0.5,
        k_table=kt, cp_table=ct)
    prep = prepare(mask)
    probe = jax.jit(lambda x: jnp.sum(x[::64, ::64, ::64]))
    dt = jnp.asarray(0.02, dtype)
    T = advance(T, prep, dt, jnp.int32(1), 0.0)
    float(probe(T))

    def loop(k, T=T):
        T2 = advance(T, prep, dt, jnp.int32(k), 0.0)
        float(probe(T2))
        assert bool(jnp.isfinite(T2).all())

    el = _timed_median(loop, steps)
    return grid.ncells / el, el


def main_varprop():
    # traffic model (fully-fused varprop path, round 4): fields build
    # kernel (T+mask in, fx/fy/fz/w out) ~21 B; radiative film ~8 B; ring
    # theta+x sweep (T+code+fx+fy+fz+w+h in, U out) ~29 B; y sweep
    # (rhs+code+fc+w+h in, one out) ~21 B; z streams REBUILT directly in
    # the z-leading layout from T/mask transposes (read ~5 B, write
    # fcz/wz/hz 12 B = 17 B — replaces the round-3 32 B stream re-lay);
    # z sweep with NATURAL rhs/out (in-kernel chunk relayout: rhs 4 +
    # code 1 + fc/w/h 12 + out 4 = 21 B — replaces the 8+8 B rhs/out
    # transpose pair) -> ~117 B/cell/step.  (History: 155 B pre-session-F
    # XLA builds; 140 B round 3 — measured 13.46 ms at 384^3 = 72% after
    # the session-G adaptive block_b2 fix.)
    value, n = _retry_shapes(run_varprop, (384, 256, 128), "varprop")
    emit(f"varprop_cell_updates_per_s_per_chip_{n}^3_f32", value,
         VARPROP_B_PER_CELL)


def run_corrected(n, steps=24, dtype=None):
    """The geometrically-faithful flagship configuration: per-face STL-
    corrected-style Robin h FIELDS + per-face radiative area scales +
    emissivity + latent heat, through the engine's fused varprop lane
    (round 5: build_face_h_axes folds the per-face fields into per-axis
    A/B streams; previously this configuration silently dropped to the
    ~2x materialized path).  Fields are synthetic here (no STL at bench
    time) but exercise the exact code path of
    ``waam_from_stl --corrected_bc --emissivity``."""
    import jax
    import jax.numpy as jnp

    from adi_thermal_fields_tpu.apps.engine import make_cartesian_engine
    from adi_thermal_fields_tpu.step.cartesian_varprop import (
        apparent_cp, melt_pool_enhanced_k)

    dtype = dtype or jnp.float32
    grid, mat, T, mask, _ = build_case(n, dtype, lite=True)
    kt = melt_pool_enhanced_k(mat.k, 1420.0, 1470.0, enhancement=4.0)
    ct = apparent_cp(mat.cp, mat.cp, 2.7e5, 1420.0, 1470.0)
    rng = np.random.default_rng(5)
    faces = ("x-", "x+", "y-", "y+", "z-", "z+")
    shape = grid.shape
    hf = {f: jnp.asarray(10.0 + 10.0 * rng.random(shape), dtype)
          for f in faces}
    sc = {f: jnp.asarray(0.7 + 0.6 * rng.random(shape), dtype)
          for f in faces}
    prepare, advance = make_cartesian_engine(
        grid, mat, robin_h=hf, radiation_scale=sc, t_inf=20.0,
        dtype=dtype, emissivity=0.5, k_table=kt, cp_table=ct)
    prep = prepare(mask)
    probe = jax.jit(lambda x: jnp.sum(x[::64, ::64, ::64]))
    dt = jnp.asarray(0.02, dtype)
    T = advance(T, prep, dt, jnp.int32(1), 0.0)
    float(probe(T))

    def loop(k, T=T):
        T2 = advance(T, prep, dt, jnp.int32(k), 0.0)
        float(probe(T2))
        assert bool(jnp.isfinite(T2).all())

    el = _timed_median(loop, steps)
    return grid.ncells / el, el


def main_corrected():
    # traffic model: the varprop 117 B plus the per-axis A/B static-film
    # stream reads (2 fields x 4 B x 3 sweeps = 24 B; the composed film
    # h = A + h_rad(T)*B replaces the radiative film stream at the same
    # materialize+read cost) -> ~141 B/cell/step
    value, n = _retry_shapes(run_corrected, (384, 256, 128), "corrected")
    emit(f"corrected_varprop_cell_updates_per_s_per_chip_{n}^3_f32", value,
         VARPROP_B_PER_CELL + 24.0)


def main_hostile():
    """HOSTILE-shape regression case (VERDICT r4 missing #2): 576 is not a
    multiple of the kernels' 128-lane tile, so any regression in the
    engine's pad-to-tile handling (a jnp.pad+slice HBM pass per stream per
    kernel call — the round-2 Cartesian cliff, re-hit by the varprop
    engine at 576^3 in round 4: 89.6 ms = 30% of model) flips THIS
    driver-recorded number, not just a NOTES anecdote.  The reference
    routinely produces non-power-of-2 grids via its voxel-budget
    auto-coarsening (waam_from_stl_v7_mm.py:247-252).  Model: the padded
    domain does 608^3-ish work on 576^3 counted cells — the same 117
    B/cell varprop model applies to within the pad overhead."""
    # (96,384,576) FIRST: the padded-576-lane check at a size that always
    # fits.  The 576^3 attempt reproducibly kills the device client with
    # FAILED_PRECONDITION (2026-08-21, three separate runs — the padded
    # (576,640,640) varprop working set is a likely HBM OOM surfacing as
    # FAILED_PRECONDITION through the relay) and the POISONED process
    # then zero-records every later attempt and case; standalone the
    # small shape runs 6.32 ms = 3.36 Gcell/s.  576^3 stays as a stretch
    # SECOND shape so its failure can no longer shadow the record.
    value, n = _retry_shapes(lambda n: run_varprop(n, steps=12),
                             ((96, 384, 576), 576), "hostile")
    tag = f"{n}^3" if isinstance(n, int) else f"{n}"
    emit(f"hostile_varprop_cell_updates_per_s_per_chip_{tag}_f32", value,
         VARPROP_B_PER_CELL)


def run_cyl_varprop(shape=(64, 512, 256), steps=30, dtype=None):
    """Variable-property cylindrical step (k(T) + apparent-cp latent heat
    + radiative films, element birth) on a part-deposited tube — the spiral_tube CLI's varprop
    configuration (step/cylindrical_varprop.py)."""
    import jax
    import jax.numpy as jnp

    from adi_thermal_fields_tpu import (CylindricalGrid, Material, RobinBC,
                                        ZFaceBC)
    from adi_thermal_fields_tpu.step.cartesian_varprop import (
        apparent_cp, melt_pool_enhanced_k)
    from adi_thermal_fields_tpu.step.cylindrical_varprop import (
        adi_step_cyl_varprop)

    dtype = dtype or jnp.float32
    nr, nphi, nz = shape
    grid = CylindricalGrid(nr, nphi, nz, 5e-4, 5e-4, r_inner=0.02)
    mat = Material(7800.0, 490.0, 54.0)
    rob = RobinBC(300.0, 20.0)
    zbc = ZFaceBC(kind_top="robin", h_top=400.0, T_inf_top=20.0)
    kt = melt_pool_enhanced_k(mat.k, 1420.0, 1470.0, enhancement=4.0)
    ct = apparent_cp(mat.cp, mat.cp, 2.7e5, 1420.0, 1470.0)
    act = np.zeros(shape, bool)
    act[:, :, :nz // 2] = True
    act[:, :(3 * nphi) // 5, nz // 2:nz // 2 + nz // 8] = True
    active = jnp.asarray(act)

    from adi_thermal_fields_tpu.step.cylindrical_varprop import (
        build_cyl_vp2_plan)

    # prebuilt vp2 face codes (production steady state between birth
    # events — the masked case's "plan prebuilt" convention)
    plan = jax.jit(lambda a: build_cyl_vp2_plan(a, grid, zbc))(active)

    @jax.jit
    def step(T, active, dt):
        return adi_step_cyl_varprop(
            T, grid, mat, dt=dt, robin_outer=rob, zbc=zbc,
            robin_inner=RobinBC(50.0, 20.0), active=active, h_void=80.0,
            T_inf_void=20.0, h_front=200.0, k_table=kt, cp_table=ct,
            emissivity=0.5, vp2_plan=plan)

    probe = jax.jit(lambda x: jnp.sum(x[::16, ::64, ::64]))
    T = jnp.where(active, 1600.0, 20.0).astype(dtype)
    dt = jnp.asarray(0.02, dtype)
    T = step(T, active, dt)
    float(probe(T))

    def loop(k, T=T):
        for _ in range(k):
            T = step(T, active, dt)
        float(probe(T))
        assert bool(jnp.isfinite(T).all())

    el = _timed_median(loop, steps)
    return nr * nphi * nz / el, el


def main_cyl_varprop():
    # traffic model (tier-2 vp2 kernels, round 4): every per-cell quantity
    # — k(T)/cp(T) clamp-sums, harmonic faces, radiative films, interface/
    # edge Robin sinks — is derived IN REGISTERS from T + a 1-byte face
    # code (solvers/pallas_vp2.py).  Per sweep: read rhs+T+code, write x;
    # the r sweep's rhs IS T.  r 9 B + phi 13 B + z 13 B (natural rhs/T/
    # out, in-kernel relayout) + code builds ~8 B + boundary-row gathers
    # ~2 B -> ~45 B/cell/step.  (History: ~170 B round-3 session C; 154 B
    # session H; 130 B round-4 session A (nat z + in-kernel phi hi-faces,
    # 13.54 ms); vp2 chip gate 7.93 ms = 4.23 Gcell/s at (64,512,1024),
    # bitwise vs the vp-fields tier, 1.70x.)
    value, shape = _retry_shapes(
        run_cyl_varprop,
        ((64, 512, 1024), (64, 512, 256), (64, 256, 128)), "cyl_varprop")
    emit(f"cyl_varprop_cell_updates_per_s_per_chip_{shape}_f32", value,
         CYL_VARPROP_B_PER_CELL)



def main_capacity():
    """768^3 (453M cells) single-chip capacity: the largest cube that fits
    one v5e chip on the ring-fused path (round 2 hit an OOM wall at 768;
    the ring kernel never materializes R0 and the bench donates its
    state).  Roofline: the 27 B/cell fused model (theta+x ring 9 + y 9 +
    natural-layout z 9 — the z transpose pair is gone, round 4)."""
    value, n = _retry_shapes(lambda n: run(n, steps=12), (768,), "capacity")
    emit(f"adi_cell_updates_per_s_per_chip_{n}^3_f32_capacity", value, 27.0)


def main_headline(hold=False):
    """Cartesian 512^3 f32 — the driver-parsed headline.  ``vs_baseline``
    stays against the conservative 48 B/cell model for round-over-round
    continuity.  The fused path's true traffic is the 27 B model since
    round 4 (theta+x ring 9 + y 9 + natural-layout z 9; the z transpose
    pair is gone) — compare via abs_GB_per_s."""
    value, n = _retry_shapes(run, (512, 384, 256, 128), "cartesian")
    rec = (f"adi_cell_updates_per_s_per_chip_{n}^3_f32", value, 48.0)
    if hold:
        return rec
    emit(*rec)


def main_all():
    """Default driver run: every flagship case, one JSON line each
    (VERDICT r3 #5).  The Cartesian headline is measured FIRST (so a
    mid-run tunnel outage cannot lose it) but printed LAST — the driver
    parses the final line, which thereby keeps its round-3 meaning.
    Cases that fail the first pass (transient FAILED_PRECONDITION
    patches) get ONE retry pass at the end before their zero records
    print."""
    global _HELD_HEADLINE, _DEFER_ZERO
    _HELD_HEADLINE = main_headline(hold=True)
    cases = ((main_varprop, "varprop"),
             (main_corrected, "corrected"),
             (main_hostile, "hostile"),
             (main_masked, "masked"),
             (main_cyl_varprop, "cyl_varprop"),
             (main_cylindrical, "cylindrical"),
             (main_bf16, "bf16"))
    failed = []
    _DEFER_ZERO = True
    for case_fn, name in cases:
        n_def = len(_DEFERRED)
        try:
            case_fn()
        except Exception as e:
            print(f"[bench] case {name} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr)
            _DEFERRED.append((f"{name}_cell_updates_per_s_per_chip", 48.0))
        if len(_DEFERRED) > n_def:
            failed.append((case_fn, name))
    if failed:
        import time as _time

        print(f"[bench] retry pass over {len(failed)} failed case(s) "
              "after 120 s (transient-outage second chance)",
              file=sys.stderr)
        _time.sleep(120)
        for case_fn, name in failed:
            stash = list(_DEFERRED)
            del _DEFERRED[:]
            _DEFER_ZERO = False      # second pass: zero records print
            try:
                case_fn()
            except Exception as e:
                print(f"[bench] case {name} retry FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}",
                      file=sys.stderr)
                emit(f"{name}_cell_updates_per_s_per_chip", None, 48.0)
            _DEFER_ZERO = True
            _DEFERRED[:] = [m for m in stash
                            if not _case_matches(m, name)]
    _DEFER_ZERO = False
    for metric, bpc in _DEFERRED:    # anything left: emit honest zeros
        emit(metric, None, bpc)
    del _DEFERRED[:]
    rec, _HELD_HEADLINE = _HELD_HEADLINE, None
    emit(*rec)


def _case_matches(deferred_entry, name):
    metric = deferred_entry[0]
    if metric.startswith(f"{name}_cell"):     # the exception-path fallback
        return True
    prefix = {"varprop": "varprop_cell", "corrected": "corrected_",
              "hostile": "hostile_", "masked": "masked_",
              "cyl_varprop": "cyl_varprop_", "cylindrical": "cyl_adi_",
              "bf16": "adi_cell"}[name]
    ok = metric.startswith(prefix)
    if name == "bf16":
        ok = ok and metric.endswith("_bf16")
    if name == "varprop":
        ok = ok and "corrected" not in metric
    return ok


_HELD_HEADLINE = None
_DEFER_ZERO = False
_DEFERRED = []


def _install_watchdog():
    """The axon tunnel has HARD OUTAGES where device init itself hangs
    forever (NOTES.md, 2026-08-18: jax.devices() hung > 3.5 h) — blocked in
    a C RPC call, so SIGALRM handlers never run.  A daemon THREAD instead:
    the driver must still receive ONE JSON line, so emit a zero-value
    record and hard-exit if the bench hasn't finished in BENCH_WATCHDOG_S
    (default 50 min; healthy runs take ~5-10, degraded compile windows
    legitimately more)."""
    import os
    import threading

    case = "headline"
    if "--case" in sys.argv:
        i = sys.argv.index("--case")
        if i + 1 < len(sys.argv):
            case = sys.argv[i + 1]
    # the default run covers every flagship case — give it a longer leash
    budget = int(os.environ.get(
        "BENCH_WATCHDOG_S", "3000" if case != "headline" else "7200"))
    metric = {"headline": "adi_cell_updates_per_s_per_chip",
              "bf16": "adi_cell_updates_per_s_per_chip_bf16",
              "cylindrical": "cyl_cell_updates_per_s_per_chip",
              "masked": "masked_cyl_cell_updates_per_s_per_chip",
              "varprop": "varprop_cell_updates_per_s_per_chip",
              "cyl_varprop": "cyl_varprop_cell_updates_per_s_per_chip",
              "hostile": "hostile_varprop_cell_updates_per_s_per_chip",
              "corrected": "corrected_varprop_cell_updates_per_s_per_chip",
              "capacity": "adi_cell_updates_per_s_per_chip_capacity",
              }.get(case, f"{case}_cell_updates_per_s_per_chip")

    def _expired():
        print("[bench] WATCHDOG: no result within "
              f"{budget}s — tunnel outage; emitting last-known record",
              file=sys.stderr)
        if _HELD_HEADLINE is not None:
            # the headline WAS measured before the stall — don't lose it
            emit(*_HELD_HEADLINE)
        else:
            print(json.dumps(
                {"metric": metric, "value": 0.0, "unit": "cell/s",
                 "vs_baseline": 0.0,
                 "error": f"watchdog: tunnel unresponsive {budget}s"}),
                flush=True)
        os._exit(2)

    t = threading.Timer(budget, _expired)
    t.daemon = True
    t.start()
    return t


if __name__ == "__main__":
    _install_watchdog()
    probe_compile_service()
    if "--case" in sys.argv and "cylindrical" in sys.argv:
        main_cylindrical()
    elif "--case" in sys.argv and "bf16" in sys.argv:
        main_bf16()
    elif "--case" in sys.argv and "masked" in sys.argv:
        main_masked()
    elif "--case" in sys.argv and "capacity" in sys.argv:
        main_capacity()
    elif "--case" in sys.argv and "cyl_varprop" in sys.argv:
        main_cyl_varprop()
    elif "--case" in sys.argv and "hostile" in sys.argv:
        main_hostile()
    elif "--case" in sys.argv and "corrected" in sys.argv:
        main_corrected()
    elif "--case" in sys.argv and "varprop" in sys.argv:
        main_varprop()
    elif "--case" in sys.argv and "cartesian" in sys.argv:
        main_headline()
    else:
        main_all()
