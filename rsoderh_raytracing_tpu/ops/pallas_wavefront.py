"""Two-kernel Pallas wavefront step: XLA keeps only the env gathers.

The wavefront body (render/wavefront.py) costs ~21 ns/lane-iteration
composed from XLA fusions around the fused trace kernel; ablation shows
the two 16-byte env gathers (~6 ns) and the trace kernel (~3 ns) are the
only irreducible parts — the rest is XLA elementwise shade/regen work
and kernel-boundary traffic. This module moves that rest into two
kernels so one iteration is:

  [XLA: alias-row gather + NEE uv/direction math (atan2/asin/gather
        live here — Mosaic has no atan2/asin and no dynamic gather)]
  [Pallas TRACE kernel: closest sweep + attributes + materials + shadow
        sweep (ops/pallas_intersect.trace_attrs_body) + NEE bsdf
        eval/pdf + GGX VNDF bsdf_sample (2 exact-RNG draws) + the quad
        fetch index]
  [XLA: ONE quad-row gather]
  [Pallas SHADE kernel: RGBE decode + bilinear + in-register pmf + MIS
        weights + radiance accumulation + path termination + film +
        regeneration (reseed + camera rays) + next-iteration NEE alias
        draw indices]

Every formula replicates the ops/{bsdf,envmap,rng}.py + render/wavefront
XLA path op-for-op (validated on hardware; ulp-level fma differences
only). The u32 RNG runs in-kernel: Mosaic cannot convert u32->f32, so
uniforms use the exact hi/lo split f32(u >> 16) * 65536 + f32(u & 0xffff)
— both terms exact, one rounding, bitwise equal to XLA's conversion
(verified).

Used by render/wavefront.py when the scene supports the unrolled trace
kernel; the composed XLA body stays as the CPU/big-scene path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rsoderh_raytracing_tpu.ops import pallas_intersect as pint
from rsoderh_raytracing_tpu.ops.bsdf import DIELECTRIC_F0
from rsoderh_raytracing_tpu.ops.rng import PI_DEVICE, TWO_PI_CIRCLE
from rsoderh_raytracing_tpu.render.integrator import THROUGHPUT_CUTOFF

PI = PI_DEVICE
SUBLANES = 32  # smaller than pallas_intersect's 64: scoped-VMEM headroom
# (the 16MB cliff; see PERFORMANCE.md) at equal throughput — 128 loses ~20%
LANES = pint.LANES
TRI_CHUNK = pint.TRI_CHUNK


def supported(scene) -> bool:
    import os

    if os.environ.get("RT_DISABLE_WFKERNELS") == "1":
        return False
    return pint.fused_supported(scene) or pint.chunked_trace_supported(scene)


# -- in-kernel exact RNG (ops/rng.py parity, verified bitwise) -----------------


def _rng_next(state):
    state = state * jnp.uint32(747796405) + jnp.uint32(2891336453)
    shift = (state >> jnp.uint32(28)) + jnp.uint32(4)
    result = ((state >> shift) ^ state) * jnp.uint32(277803737)
    result = (result >> jnp.uint32(22)) ^ result
    return state, result


def _u32_to_f32(bits):
    """Exact RNE u32->f32 (Mosaic lacks the direct cast): both halves are
    exact in f32 and the single add rounds once."""
    hi = (bits >> jnp.uint32(16)).astype(jnp.int32).astype(jnp.float32)
    lo = (bits & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
    return hi * jnp.float32(65536.0) + lo


def _uniform(state):
    state, bits = _rng_next(state)
    return state, _u32_to_f32(bits) / jnp.float32(4294967295.0)


# -- componentwise vector helpers ---------------------------------------------


def _vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _vcross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _vwhere(m, a, b):
    return tuple(jnp.where(m, x, y) for x, y in zip(a, b))


def _vscale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _vnorm_maxeps(a):
    return jnp.maximum(
        jnp.sqrt(a[0] * a[0] + a[1] * a[1] + a[2] * a[2]), 1.0e-20
    )


def _saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def _lum(c):
    return 0.2126 * c[0] + 0.7152 * c[1] + 0.0722 * c[2]


# -- BSDF (ops/bsdf.py parity, componentwise) ----------------------------------


def _make_frame(n):
    """(tangent, bitangent, normal) tuples (ops/bsdf.py:make_frame)."""
    use_z = jnp.abs(n[2]) < 0.999
    zero = jnp.zeros_like(n[0])
    helper = (
        jnp.where(use_z, 0.0, 1.0),
        zero,
        jnp.where(use_z, 1.0, 0.0),
    )
    t = _vcross(helper, n)
    t = _vscale(t, 1.0 / _vnorm_maxeps(t))
    b = _vcross(n, t)
    return t, b, n


def _to_local(frame, v):
    t, b, n = frame
    return (_vdot(v, t), _vdot(v, b), _vdot(v, n))


def _to_world(frame, v):
    t, b, n = frame
    w = (
        t[0] * v[0] + b[0] * v[1] + n[0] * v[2],
        t[1] * v[0] + b[1] * v[1] + n[1] * v[2],
        t[2] * v[0] + b[2] * v[1] + n[2] * v[2],
    )
    return _vscale(w, 1.0 / _vnorm_maxeps(w))


def _d_ggx(ndh, alpha):
    a2 = alpha * alpha
    denom = ndh * ndh * (a2 - 1.0) + 1.0
    return a2 / (PI * denom * denom)


def _g1_ggx(ndv, alpha):
    ndv2 = ndv * ndv
    lam = (
        jnp.sqrt(1.0 + alpha * alpha * (1.0 - ndv2) / jnp.maximum(ndv2, 1e-20))
        - 1.0
    ) / 2.0
    return 1.0 / (1.0 + lam)


def _surface_kd(color, metallic, f0):
    kd0_s = 1.0 - _saturate(metallic)
    fmax_s = 1.0 - jnp.maximum(f0[0], jnp.maximum(f0[1], f0[2]))
    return (
        (color[0] * kd0_s) * fmax_s,
        (color[1] * kd0_s) * fmax_s,
        (color[2] * kd0_s) * fmax_s,
    )


def _bsdf_eval(wo, wi, color, metallic, alpha, f0):
    ndo, ndi = wo[2], wi[2]
    valid = (ndo > 0.0) & (ndi > 0.0)
    h = (wo[0] + wi[0], wo[1] + wi[1], wo[2] + wi[2])
    h = _vscale(h, 1.0 / _vnorm_maxeps(h))
    ndh = _saturate(h[2])
    d = _d_ggx(ndh, alpha)
    g = _g1_ggx(ndo, alpha) * _g1_ggx(ndi, alpha)
    x = 1.0 - _saturate(_vdot(h, wo))
    x2 = x * x
    x5 = x2 * x2 * x
    fr = (f0[0] + (1.0 - f0[0]) * x5,
          f0[1] + (1.0 - f0[1]) * x5,
          f0[2] + (1.0 - f0[2]) * x5)
    denom = 4.0 * ndo * ndi
    fs_s = d * g / jnp.where(valid, denom, 1.0)
    kd = _surface_kd(color, metallic, f0)
    inv_pi = 1.0 / PI
    out = tuple(
        jnp.where(valid, kd[i] * inv_pi + fs_s * fr[i], 0.0)
        for i in range(3)
    )
    return out


def _bsdf_pdf(wo, wi, f0, alpha):
    spec_p = _saturate(_lum(f0))
    diff_p = 1.0 - spec_p
    h = (wo[0] + wi[0], wo[1] + wi[1], wo[2] + wi[2])
    h = _vscale(h, 1.0 / _vnorm_maxeps(h))
    wo_dot_h = jnp.abs(_vdot(wo, h))
    ndh = h[2]
    pdf_half = (
        _d_ggx(ndh, alpha)
        * _g1_ggx(wo[2], alpha)
        * jnp.maximum(0.0, _vdot(wo, h))
        / jnp.where(wo[2] == 0.0, 1.0, wo[2])
    )
    pdf_half = jnp.where(ndh <= 0.0, 0.0, pdf_half)
    pdf_spec = pdf_half / jnp.maximum(4.0 * wo_dot_h, 1.0e-20)
    pdf_spec = jnp.where(wo_dot_h <= 0.0, 0.0, pdf_spec)
    pdf_cos = jnp.where(wi[2] <= 0.0, 0.0, wi[2] / PI)
    pdf = diff_p * pdf_cos + spec_p * pdf_spec
    return jnp.where((wo[2] > 0.0) & (wi[2] > 0.0), pdf, 0.0)


def _bsdf_sample(state, rd, n, color, metallic, alpha, f0):
    """ops/bsdf.py:bsdf_sample, componentwise. Returns
    (state, dir, scattering, pdf, zero_direction)."""
    wo_world = (-rd[0], -rd[1], -rd[2])
    bail_a = _vdot(n, wo_world) <= 0.0
    frame = _make_frame(n)
    wo = _to_local(frame, wo_world)
    bail_b = wo[2] <= 0.0

    spec_p = _saturate(_lum(f0))
    diff_p = 1.0 - spec_p
    state, u1 = _uniform(state)
    state, u2 = _uniform(state)

    # diffuse candidate (cosine hemisphere, u1 rescaled)
    du = u1 / jnp.maximum(diff_p, 1.0e-6)
    r_d = jnp.sqrt(du)
    phi_d = 2.0 * PI * u2
    dxl = r_d * jnp.cos(phi_d)
    dyl = r_d * jnp.sin(phi_d)
    dzl = jnp.sqrt(jnp.maximum(0.0, 1.0 - dxl * dxl - dyl * dyl))
    wi_diff = (dxl, dyl, dzl)

    # specular candidate (GGX VNDF)
    su = (u1 - diff_p) / jnp.maximum(spec_p, 1.0e-6)
    view = (wo[0] * alpha, wo[1] * alpha, wo[2])
    view = _vscale(view, 1.0 / _vnorm_maxeps(view))
    len_sq = view[0] * view[0] + view[1] * view[1]
    inv_len = jax.lax.rsqrt(jnp.maximum(len_sq, 1.0e-20))
    has_len = len_sq > 0.0
    tx = (
        jnp.where(has_len, -view[1] * inv_len, 1.0),
        jnp.where(has_len, view[0] * inv_len, 0.0),
        jnp.zeros_like(view[0]),
    )
    ty = _vcross(view, tx)
    radius = jnp.sqrt(su)
    az = 2.0 * PI * u2
    dska = radius * jnp.cos(az)
    dskb_raw = radius * jnp.sin(az)
    dskb = (1.0 - view[2]) * jnp.sqrt(
        jnp.maximum(0.0, 1.0 - dska * dska)
    ) + view[2] * dskb_raw
    hz = jnp.sqrt(jnp.maximum(0.0, 1.0 - dska * dska - dskb * dskb))
    hst = (
        dska * tx[0] + dskb * ty[0] + hz * view[0],
        dska * tx[1] + dskb * ty[1] + hz * view[1],
        dska * tx[2] + dskb * ty[2] + hz * view[2],
    )
    h = (hst[0] * alpha, hst[1] * alpha, jnp.maximum(0.0, hst[2]))
    h = _vscale(h, 1.0 / _vnorm_maxeps(h))
    wo_dot_h2 = 2.0 * _vdot(wo, h)
    wi_spec = (
        wo_dot_h2 * h[0] - wo[0],
        wo_dot_h2 * h[1] - wo[1],
        wo_dot_h2 * h[2] - wo[2],
    )

    choose_diffuse = u1 < diff_p
    wi = _vwhere(choose_diffuse, wi_diff, wi_spec)
    spec_fail = (~choose_diffuse) & (wi_spec[2] <= 0.0)

    scattering = _bsdf_eval(wo, wi, color, metallic, alpha, f0)
    pdf = _bsdf_pdf(wo, wi, f0, alpha)
    wi_world = _to_world(frame, wi)
    bail_c = _vdot(n, wi_world) < 0.0

    zero3 = tuple(jnp.zeros_like(wi_world[i]) for i in range(3))
    one = jnp.ones_like(wi_world[0])
    red = (one, zero3[1], zero3[2])
    green = (zero3[0], one, zero3[2])
    blue = (zero3[0], zero3[1], one)

    direction = _vwhere(bail_c, zero3, wi_world)
    direction = _vwhere(spec_fail, red, direction)
    direction = _vwhere(bail_a | bail_b, zero3, direction)

    scattering = _vwhere(bail_c, green, scattering)
    scattering = _vwhere(spec_fail, red, scattering)
    scattering = _vwhere(bail_b, green, scattering)
    scattering = _vwhere(bail_a, blue, scattering)

    any_bail = bail_a | bail_b | bail_c | spec_fail
    pdf = jnp.where(any_bail, 0.0, pdf)
    zero_direction = bail_a | bail_b | (bail_c & ~spec_fail)
    return state, direction, scattering, pdf, zero_direction


# -- TRACE kernel ---------------------------------------------------------------


def trace_epilogue(rd, nee_dir, normal, color, rough, metal, state_in):
    """PARITY-CRITICAL shared epilogue after winner attributes are known:
    material-derived params (ops/bsdf.py:make_bsdf_material), NEE partial
    shade (frame/eval/pdf need no radiance), and the GGX bounce sample
    (2 exact RNG draws). The single source for both the small-scene trace
    kernel (_finish_trace) and the big-scene mega-shade kernel — any
    estimator fix lands in both paths at once. Returns (cos_theta,
    nee_scatter, nee_pdf_b, state, bdir, bscat, bpdf, bzero,
    cos_bounce)."""
    alpha = jnp.maximum(0.001, rough * rough)
    msat = _saturate(metal)
    f0 = tuple(
        DIELECTRIC_F0 + (color[i] - DIELECTRIC_F0) * msat for i in range(3)
    )
    cos_theta = jnp.maximum(0.0, _vdot(normal, nee_dir))
    frame = _make_frame(normal)
    wo = _to_local(frame, (-rd[0], -rd[1], -rd[2]))
    wi = _to_local(frame, nee_dir)
    nee_scatter = _bsdf_eval(wo, wi, color, metal, alpha, f0)
    nee_pdf_b = _bsdf_pdf(wo, wi, f0, alpha)
    state, bdir, bscat, bpdf, bzero = _bsdf_sample(
        state_in, rd, normal, color, metal, alpha, f0
    )
    cos_bounce = jnp.maximum(0.0, _vdot(normal, bdir))
    return (
        cos_theta, nee_scatter, nee_pdf_b, state, bdir, bscat, bpdf,
        bzero, cos_bounce,
    )


def _finish_trace(env_w, env_h, a, rd, nee_dir, nu, nv, mu, mv, state_in, outs):
    """Shared trace epilogue (trace_epilogue) plus the fused quad fetch
    index and all 26 output writes. `a` is trace_attrs_body's dict."""
    (hit_ref, occ_ref,
     px_ref, py_ref, pz_ref,
     er_ref, eg_ref, eb_ref,
     ct_ref, ns0_ref, ns1_ref, ns2_ref, npdf_ref,
     bd0_ref, bd1_ref, bd2_ref, bpdf_ref,
     bs0_ref, bs1_ref, bs2_ref, bz_ref, cb_ref,
     stout_ref, qidx_ref, fu_ref, fv_ref) = outs

    did_hit = a["did_hit"]
    normal = (a["nx"], a["ny"], a["nz"])
    (
        cos_theta, nee_scatter, nee_pdf_b, state, bdir, bscat, bpdf,
        bzero, cos_bounce,
    ) = trace_epilogue(
        rd, nee_dir, normal, (a["cr"], a["cg"], a["cb"]), a["rough"],
        a["metal"], state_in,
    )

    # quad fetch index at the fused uv (ops/envmap.py:_quad_fetch)
    fu = jnp.where(did_hit, nu, mu)
    fv = jnp.where(did_hit, nv, mv)
    x0 = jnp.floor(fu * env_w - 0.5)
    y0 = jnp.floor(fv * env_h - 0.5)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, env_w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, env_h - 1)

    hit_ref[:] = did_hit.astype(jnp.int32)
    occ_ref[:] = a["occ"].astype(jnp.int32)
    px_ref[:] = a["px"]
    py_ref[:] = a["py"]
    pz_ref[:] = a["pz"]
    er_ref[:] = a["er"]
    eg_ref[:] = a["eg"]
    eb_ref[:] = a["eb"]
    ct_ref[:] = cos_theta
    ns0_ref[:] = nee_scatter[0]
    ns1_ref[:] = nee_scatter[1]
    ns2_ref[:] = nee_scatter[2]
    npdf_ref[:] = nee_pdf_b
    bd0_ref[:] = bdir[0]
    bd1_ref[:] = bdir[1]
    bd2_ref[:] = bdir[2]
    bpdf_ref[:] = bpdf
    bs0_ref[:] = bscat[0]
    bs1_ref[:] = bscat[1]
    bs2_ref[:] = bscat[2]
    bz_ref[:] = bzero.astype(jnp.int32)
    cb_ref[:] = cos_bounce
    stout_ref[:] = state
    qidx_ref[:] = y0i * env_w + x0i
    fu_ref[:] = fu
    fv_ref[:] = fv


def _trace_kernel(n_sph, n_pln, n_tri, n_mat, env_w, env_h, *args):
    refs = args[:18]
    extras = args[18:30]
    (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
     sx_ref, sy_ref, sz_ref,
     nu_ref, nv_ref, mu_ref, mv_ref, st_ref) = args[30:44]
    outs = args[44:]

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    sx, sy, sz = sx_ref[:], sy_ref[:], sz_ref[:]

    a = pint.trace_attrs_body(
        n_sph, n_pln, n_tri, n_mat, refs, extras,
        ox, oy, oz, dx, dy, dz, sx, sy, sz,
    )
    _finish_trace(
        env_w, env_h, a, (dx, dy, dz), (sx, sy, sz),
        nu_ref[:], nv_ref[:], mu_ref[:], mv_ref[:], st_ref[:], outs,
    )


# -- SHADE kernel ----------------------------------------------------------------


def _decode_rgbe(word):
    """ops/envmap.py:decode_rgbe, componentwise (returns r,g,b tiles)."""
    r = (word & jnp.uint32(0xFF)).astype(jnp.int32).astype(jnp.float32)
    g = ((word >> jnp.uint32(8)) & jnp.uint32(0xFF)).astype(
        jnp.int32
    ).astype(jnp.float32)
    b = ((word >> jnp.uint32(16)) & jnp.uint32(0xFF)).astype(
        jnp.int32
    ).astype(jnp.float32)
    e = (word >> jnp.uint32(24)).astype(jnp.int32)
    bits = jnp.clip(e - 136 + 127, 1, 254).astype(jnp.int32) << 23
    scale = jnp.where(
        e == 0, 0.0, jax.lax.bitcast_convert_type(bits, jnp.float32)
    )
    return (r * scale, g * scale, b * scale)


def _shade_kernel(
    env_w, env_h, width, height, max_bounces, *args
):
    (
        q0_ref, q1_ref, q2_ref, q3_ref,
        hit_ref, occ_ref, px_ref, py_ref, pz_ref,
        er_ref, eg_ref, eb_ref,
        ct_ref, ns0_ref, ns1_ref, ns2_ref, npdf_ref,
        bd0_ref, bd1_ref, bd2_ref, bpdf_ref,
        bs0_ref, bs1_ref, bs2_ref, bz_ref, cb_ref,
        st_ref, fu_ref, fv_ref, npmf_ref,
        # carry
        t0_ref, t1_ref, t2_ref, i0_ref, i1_ref, i2_ref,
        lp_ref, bn_ref, smp_ref, inp_ref,
        f0_ref, f1_ref, f2_ref,
        ro0_ref, ro1_ref, ro2_ref, rd0_ref, rd1_ref, rd2_ref,
        # loop-invariant lanes
        pixidx_ref, pixx_ref, pixy_ref, base_ref,
        # scalars
        scal_ref,  # SMEM f32: [max_y, aspect, cpx, cpy, cpz, r00..r22, L, Z]
        iscal_ref,  # SMEM u32: [it_next, spp, budget, stride, offset]
    ) = args[:55]
    outs = args[55:]

    v = dict(
        hit=hit_ref[:], occ=occ_ref[:],
        px=px_ref[:], py=py_ref[:], pz=pz_ref[:],
        er=er_ref[:], eg=eg_ref[:], eb=eb_ref[:],
        ct=ct_ref[:],
        ns=(ns0_ref[:], ns1_ref[:], ns2_ref[:]), npdf=npdf_ref[:],
        bd=(bd0_ref[:], bd1_ref[:], bd2_ref[:]), bpdf=bpdf_ref[:],
        bs=(bs0_ref[:], bs1_ref[:], bs2_ref[:]), bz=bz_ref[:],
        cb=cb_ref[:], state=st_ref[:],
        fu=fu_ref[:], fv=fv_ref[:], npmf=npmf_ref[:],
    )
    carry = dict(
        tp=(t0_ref[:], t1_ref[:], t2_ref[:]),
        inc=(i0_ref[:], i1_ref[:], i2_ref[:]),
        last_pdf=lp_ref[:], bounce=bn_ref[:], sample=smp_ref[:],
        in_path=inp_ref[:],
        film=(f0_ref[:], f1_ref[:], f2_ref[:]),
        ro=(ro0_ref[:], ro1_ref[:], ro2_ref[:]),
        rd=(rd0_ref[:], rd1_ref[:], rd2_ref[:]),
    )
    pix = (pixidx_ref[:], pixx_ref[:], pixy_ref[:], base_ref[:])
    _shade_core(
        env_w, env_h, width, height, max_bounces,
        (q0_ref[:], q1_ref[:], q2_ref[:], q3_ref[:]),
        v, carry, pix, scal_ref, iscal_ref, outs,
    )


def _shade_core(
    env_w, env_h, width, height, max_bounces, q, v, carry, pix,
    scal_ref, iscal_ref, outs,
):
    """Shade/regen body on VALUE tiles: RGBE decode + bilinear + pmf +
    MIS + radiance accumulation + termination + film + regeneration.
    `v` holds the trace products (see _shade_kernel); `carry` the loop
    state; `outs` the 22 output refs."""
    (
        ost_ref, oro0_ref, oro1_ref, oro2_ref,
        ord0_ref, ord1_ref, ord2_ref,
        ot0_ref, ot1_ref, ot2_ref, oi0_ref, oi1_ref, oi2_ref,
        olp_ref, obn_ref, osmp_ref, oinp_ref,
        of0_ref, of1_ref, of2_ref,
        oact_ref, ohit_ref,
    ) = outs
    pixidx, pixx, pixy, base = pix

    active = carry["in_path"] != 0
    did_hit = v["hit"] != 0
    is_hit = active & did_hit
    is_miss = active & ~did_hit
    throughput = carry["tp"]
    incoming = carry["inc"]
    fu, fv = v["fu"], v["fv"]

    # ---- quad row -> bilinear radiance + pmf (envmap.py rgbe path) ------
    x = fu * env_w - 0.5
    y = fv * env_h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = jnp.where(x0 < 0, 0.0, x - x0)
    fy = jnp.where(y0 < 0, 0.0, y - y0)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, env_w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, env_h - 1)
    c00 = _decode_rgbe(q[0])
    c10 = _decode_rgbe(q[1])
    c01 = _decode_rgbe(q[2])
    c11 = _decode_rgbe(q[3])
    radiance = tuple(
        (c00[i] * (1.0 - fx) + c10[i] * fx) * (1.0 - fy)
        + (c01[i] * (1.0 - fx) + c11[i] * fx) * fy
        for i in range(3)
    )
    pxsel = jnp.minimum((fu * env_w).astype(jnp.int32), env_w - 1)
    pysel = jnp.minimum((fv * env_h).astype(jnp.int32), env_h - 1)
    sel_x = pxsel != x0i
    sel_y = pysel != y0i
    selt = tuple(
        jnp.where(
            sel_y,
            jnp.where(sel_x, c11[i], c01[i]),
            jnp.where(sel_x, c10[i], c00[i]),
        )
        for i in range(3)
    )
    # _texel_pmf (np.pi like the alias builder, NOT the shader PI)
    lum = 0.2126 * selt[0] + 0.7152 * selt[1] + 0.0722 * selt[2]
    sin_theta = jnp.sin(
        (pysel.astype(jnp.float32) + 0.5) * jnp.float32(np.pi / env_h)
    )
    length = scal_ref[14]
    total = scal_ref[15]
    quad_pmf = jnp.where(
        total > 0.0,
        ((lum * sin_theta * length) / total) / length,
        1.0 / length,
    )

    pmf = jnp.where(is_hit, v["npmf"], quad_pmf)
    solid = (
        (2.0 * PI / env_w)
        * (PI / env_h)
        * jnp.maximum(1.0e-6, jnp.sin(PI * fv))
    )
    pdf_env = pmf / solid

    # ---- miss: environment light with MIS --------------------------------
    last_pdf = carry["last_pdf"]
    a2 = last_pdf * last_pdf
    b2 = pdf_env * pdf_env
    # bsdf.power_heuristic guards the denominator (both pdfs can
    # underflow to 0 simultaneously -> NaN without it)
    miss_weight = a2 / jnp.maximum(a2 + b2, 1.0e-30)
    incoming = tuple(
        incoming[i]
        + jnp.where(is_miss, throughput[i] * radiance[i] * miss_weight, 0.0)
        for i in range(3)
    )

    # ---- hit: emission + NEE ---------------------------------------------
    emis = (v["er"], v["eg"], v["eb"])
    incoming = tuple(
        incoming[i] + jnp.where(is_hit, throughput[i] * emis[i], 0.0)
        for i in range(3)
    )
    cos_theta = v["ct"]
    npdf = v["npdf"]
    e2 = pdf_env * pdf_env
    n2 = npdf * npdf
    nee_weight = e2 / jnp.maximum(e2 + n2, 1.0e-30)
    nee_ok = (
        is_hit & (cos_theta > 0.0) & (pdf_env > 0.0) & (v["occ"] == 0)
    )
    cos_over_pdf = cos_theta / jnp.maximum(pdf_env, 1.0e-30)
    ns = v["ns"]
    incoming = tuple(
        incoming[i]
        + jnp.where(
            nee_ok,
            throughput[i] * nee_weight * radiance[i] * ns[i] * cos_over_pdf,
            0.0,
        )
        for i in range(3)
    )

    # ---- bounce / termination --------------------------------------------
    bzero = v["bz"] != 0
    bscat = v["bs"]
    error_lane = is_hit & bzero
    incoming = _vwhere(error_lane, bscat, incoming)

    bpdf = v["bpdf"]
    tp_scale = v["cb"] / jnp.maximum(bpdf, 1.0e-30)
    new_tp = tuple(throughput[i] * bscat[i] * tp_scale for i in range(3))
    tp_norm = jnp.sqrt(
        new_tp[0] * new_tp[0]
        + new_tp[1] * new_tp[1]
        + new_tp[2] * new_tp[2]
    )
    bounce = carry["bounce"] + 1
    continues = (
        is_hit
        & ~bzero
        & (bpdf > 0.0)
        & (tp_norm >= THROUGHPUT_CUTOFF)
        & (bounce < max_bounces)
    )
    path_done = active & ~continues

    film = tuple(
        carry["film"][i] + jnp.where(path_done, incoming[i], 0.0)
        for i in range(3)
    )
    sample = carry["sample"]
    next_sample = jnp.where(path_done, sample + jnp.uint32(1), sample)

    # ---- regenerate (render/wavefront.py:start_path) ----------------------
    it_next = iscal_ref[0]
    spp = iscal_ref[1]
    budget = iscal_ref[2]
    stride = iscal_ref[3]
    offset = iscal_ref[4]
    regen = path_done & (next_sample < spp) & (it_next < budget)

    # seed(pixel_index, sample_map(base + next_sample)) — rng.py:seed
    global_sample = (base + next_sample) * stride + offset
    fstate = jnp.zeros_like(pixidx) ^ pixidx
    fstate, _ = _rng_next(fstate)
    fstate = fstate ^ global_sample
    fstate, _ = _rng_next(fstate)
    # camera jitter (rng.py:next_in_circle)
    fstate, ua = _uniform(fstate)
    angle = ua * jnp.float32(TWO_PI_CIRCLE)
    fstate, ur = _uniform(fstate)
    radius = jnp.sqrt(ur)
    jx = radius * jnp.cos(angle)
    jy = radius * jnp.sin(angle)
    # pinhole rays (render/wavefront.py:_camera_rays)
    max_y = scal_ref[0]
    aspect = scal_ref[1]
    jpx = pixx.astype(jnp.float32) + jx
    jpy = pixy.astype(jnp.float32) + jy
    sxn = jpx / width * 2.0 - 1.0
    syn = -(jpy / height * 2.0 - 1.0)
    rc0 = sxn * max_y * aspect
    rc1 = syn * max_y
    # d = ray_cam @ rot.T  (rot rows in scal[5..13])
    fd0 = rc0 * scal_ref[5] + rc1 * scal_ref[6] - scal_ref[7]
    fd1 = rc0 * scal_ref[8] + rc1 * scal_ref[9] - scal_ref[10]
    fd2 = rc0 * scal_ref[11] + rc1 * scal_ref[12] - scal_ref[13]
    fnorm = jnp.sqrt(fd0 * fd0 + fd1 * fd1 + fd2 * fd2)
    fd0, fd1, fd2 = fd0 / fnorm, fd1 / fnorm, fd2 / fnorm

    in_path = (active & continues) | regen
    state = jnp.where(regen, fstate, v["state"])
    point = (v["px"], v["py"], v["pz"])
    ro_old = carry["ro"]
    rd_old = carry["rd"]
    bdir = v["bd"]
    ro = _vwhere(regen, (scal_ref[2] + jnp.zeros_like(fd0),
                         scal_ref[3] + jnp.zeros_like(fd0),
                         scal_ref[4] + jnp.zeros_like(fd0)),
                 _vwhere(continues, point, ro_old))
    rd = _vwhere(regen, (fd0, fd1, fd2), _vwhere(continues, bdir, rd_old))
    one = jnp.ones_like(fd0)
    throughput = _vwhere(
        regen, (one, one, one), _vwhere(continues, new_tp, throughput)
    )
    incoming = _vwhere(
        regen | path_done,
        (jnp.zeros_like(one), jnp.zeros_like(one), jnp.zeros_like(one)),
        incoming,
    )
    last_pdf = jnp.where(
        regen, 1.0, jnp.where(continues, bpdf, last_pdf)
    )
    bounce = jnp.where(regen, 0, bounce)

    ost_ref[:] = state
    oro0_ref[:], oro1_ref[:], oro2_ref[:] = ro
    ord0_ref[:], ord1_ref[:], ord2_ref[:] = rd
    ot0_ref[:], ot1_ref[:], ot2_ref[:] = throughput
    oi0_ref[:], oi1_ref[:], oi2_ref[:] = incoming
    olp_ref[:] = last_pdf
    obn_ref[:] = bounce
    osmp_ref[:] = next_sample
    oinp_ref[:] = in_path.astype(jnp.int32)
    of0_ref[:], of1_ref[:], of2_ref[:] = film
    oact_ref[:] = active.astype(jnp.int32)
    ohit_ref[:] = is_hit.astype(jnp.int32)


# -- orchestration ---------------------------------------------------------------


def _tiles(n_pad):
    rows = n_pad // LANES
    grid = rows // SUBLANES
    block = pl.BlockSpec(
        (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return rows, grid, block, smem


TRACE_OUT_NAMES = (
    "hit", "occ", "px", "py", "pz", "er", "eg", "eb",
    "ct", "ns0", "ns1", "ns2", "npdf",
    "bd0", "bd1", "bd2", "bpdf", "bs0", "bs1", "bs2", "bz", "cb",
    "state", "qidx", "fu", "fv",
)
_TRACE_OUT_DTYPES = {
    "hit": jnp.int32, "occ": jnp.int32, "bz": jnp.int32,
    "state": jnp.uint32, "qidx": jnp.int32,
}


def trace_call(scene, env_w, env_h, ro, rd, nee_dir, nee_uv, miss_uv, state):
    """Run the trace kernel over (rows, LANES)-tiled component arrays.

    ro/rd/nee_dir: 3-tuples of tiles; nee_uv/miss_uv: 2-tuples; state: u32
    tile. Returns the 26 output tiles as a dict (small unrolled scenes
    only — big-triangle scenes use the chunked sweeps + big_shade_call)."""
    rows = state.shape[0]
    grid = rows // SUBLANES
    _, _, block, smem = _tiles(rows * LANES)

    n_sph = scene.sph_radius.shape[0]
    n_pln = scene.pln_valid.shape[0]
    n_tri = scene.tri_valid.shape[0]
    n_mat = scene.mat_roughness.shape[0]
    extras = (
        scene.sph_radius, scene.sph_material, scene.pln_material,
        scene.tri_material, scene.tri_a, scene.tri_n0, scene.tri_n1,
        scene.tri_n2, scene.mat_color, scene.mat_roughness,
        scene.mat_metallic, scene.mat_emission,
    )

    outs = tuple(
        jax.ShapeDtypeStruct(
            (rows, LANES), _TRACE_OUT_DTYPES.get(nm, jnp.float32)
        )
        for nm in TRACE_OUT_NAMES
    )
    res = pl.pallas_call(
        partial(_trace_kernel, n_sph, n_pln, n_tri, n_mat, env_w, env_h),
        grid=(grid,),
        in_specs=[smem] * 30 + [block] * 14,
        out_specs=tuple(block for _ in outs),
        out_shape=outs,
        interpret=pint._interpret(),
    )(
        *pint._scene_refs(scene), *extras,
        ro[0], ro[1], ro[2], rd[0], rd[1], rd[2],
        nee_dir[0], nee_dir[1], nee_dir[2],
        nee_uv[0], nee_uv[1], miss_uv[0], miss_uv[1], state,
    )
    return dict(zip(TRACE_OUT_NAMES, res))


SHADE_OUT_NAMES = (
    "state", "ro0", "ro1", "ro2", "rd0", "rd1", "rd2",
    "tp0", "tp1", "tp2", "inc0", "inc1", "inc2",
    "last_pdf", "bounce", "sample", "in_path",
    "film0", "film1", "film2", "active", "hitmask",
)
SHADE_OUT_DTYPES = {
    "state": jnp.uint32, "bounce": jnp.int32, "sample": jnp.uint32,
    "in_path": jnp.int32, "active": jnp.int32, "hitmask": jnp.int32,
}


def shade_call(
    env_w, env_h, width, height, max_bounces,
    qwords, tr, nee_pmf, carry, pixel_index, pixel_x, pixel_y, base_sample,
    scal, iscal,
):
    """Run the shade/regen kernel. qwords: 4-tuple of u32 tiles; tr: the
    trace_call output dict; carry: dict of tiles; scal: (16,) f32; iscal:
    (5,) u32. Returns (new_carry, active_mask, hit_mask)."""
    rows = nee_pmf.shape[0]
    grid = rows // SUBLANES
    _, _, block, smem = _tiles(rows * LANES)

    out_names = SHADE_OUT_NAMES
    outs = tuple(
        jax.ShapeDtypeStruct(
            (rows, LANES), SHADE_OUT_DTYPES.get(nm, jnp.float32)
        )
        for nm in out_names
    )
    ins = (
        qwords[0], qwords[1], qwords[2], qwords[3],
        tr["hit"], tr["occ"], tr["px"], tr["py"], tr["pz"],
        tr["er"], tr["eg"], tr["eb"],
        tr["ct"], tr["ns0"], tr["ns1"], tr["ns2"], tr["npdf"],
        tr["bd0"], tr["bd1"], tr["bd2"], tr["bpdf"],
        tr["bs0"], tr["bs1"], tr["bs2"], tr["bz"], tr["cb"],
        tr["state"], tr["fu"], tr["fv"], nee_pmf,
        carry["tp0"], carry["tp1"], carry["tp2"],
        carry["inc0"], carry["inc1"], carry["inc2"],
        carry["last_pdf"], carry["bounce"], carry["sample"],
        carry["in_path"],
        carry["film0"], carry["film1"], carry["film2"],
        carry["ro0"], carry["ro1"], carry["ro2"],
        carry["rd0"], carry["rd1"], carry["rd2"],
        pixel_index, pixel_x, pixel_y, base_sample,
        scal, iscal,
    )
    res = pl.pallas_call(
        partial(_shade_kernel, env_w, env_h, width, height, max_bounces),
        grid=(grid,),
        in_specs=[block] * 53 + [smem, smem],
        out_specs=tuple(block for _ in outs),
        out_shape=outs,
        interpret=pint._interpret(),
    )(*ins)
    out = dict(zip(out_names, res))
    new_carry = {k: out[k] for k in out_names[:-2]}
    return new_carry, out["active"], out["hitmask"]


# -- big-scene (chunked) variant: one winner take, one mega-shade kernel -------
#
# Big-triangle scenes can't unroll the trace kernel; their closest hit and
# NEE occlusion run as the chunked-grid sweep kernels
# (ops/pallas_intersect.py). The winner's attributes are fetched by ONE
# XLA take from a unified (n_sph+n_pln+n_tri, 20)-f32 union-layout table
# (winner_table below): small-table gathers are per-OP bound, not
# row-size bound — 13 narrow takes cost 112 ms at 4.2M lanes where one
# 80-byte-row take costs 18 ms (measured; scripts/takes_microbench.py).
# In-kernel per-chunk selects were also measured and lose (~50% of a
# chunk sweep). EVERYTHING elementwise after the take — normals, material
# values, NEE eval/pdf, the GGX bounce sample, and the whole shade/regen
# body — runs in this single kernel, mirroring the two-kernel split that
# lifted the small-scene path 34.7 -> 122.7 Mrays/s.
#
# Union slot layout (per winner type; unused slots are zero):
#   sphere: s0..s2 = pos, s3 = radius,                 s18 = material id
#   plane:  s0..s2 = normal,                           s18 = material id
#   tri:    s0..s2=a s3..s5=e0 s6..s8=e1
#           s9..s11=n0 s12..s14=n1 s15..s17=n2,        s18 = material id
# Material ids are stored as exact small-int f32; slot 19 pads the row
# to 80 bytes.

WINNER_SLOTS = 20


def winner_table(scene):
    """The unified (n_sph+n_pln+n_tri, WINNER_SLOTS) f32 winner-attribute
    table. Built from device-scene fields under jit — loop-invariant, so
    XLA hoists it out of the wavefront while_loop."""
    n_sph = scene.sph_radius.shape[0]
    n_pln = scene.pln_valid.shape[0]
    n_tri = scene.tri_valid.shape[0]
    sph = jnp.zeros((n_sph, WINNER_SLOTS), jnp.float32)
    sph = sph.at[:, 0:3].set(scene.sph_pos)
    sph = sph.at[:, 3].set(scene.sph_radius)
    sph = sph.at[:, 18].set(scene.sph_material.astype(jnp.float32))
    pln = jnp.zeros((n_pln, WINNER_SLOTS), jnp.float32)
    pln = pln.at[:, 0:3].set(scene.pln_normal)
    pln = pln.at[:, 18].set(scene.pln_material.astype(jnp.float32))
    tri = jnp.zeros((n_tri, WINNER_SLOTS), jnp.float32)
    tri = tri.at[:, 0:3].set(scene.tri_a)
    tri = tri.at[:, 3:6].set(scene.tri_edge0)
    tri = tri.at[:, 6:9].set(scene.tri_edge1)
    tri = tri.at[:, 9:12].set(scene.tri_n0)
    tri = tri.at[:, 12:15].set(scene.tri_n1)
    tri = tri.at[:, 15:18].set(scene.tri_n2)
    tri = tri.at[:, 18].set(scene.tri_material.astype(jnp.float32))
    return jnp.concatenate([sph, pln, tri], axis=0)


def _big_shade_kernel(n_mat, env_w, env_h, width, height, max_bounces, *args):
    (
        mat_color, mat_rough, mat_metal, mat_emis,  # SMEM tables
        q0_ref, q1_ref, q2_ref, q3_ref,
        hit_ref, occ_ref, btype_ref,
        px_ref, py_ref, pz_ref,
    ) = args[:14]
    s = args[14:33]  # winner_table slots s0..s18 (union layout above)
    (
        sx_ref, sy_ref, sz_ref,  # NEE direction
        st_ref,  # state (post alias draw)
        fu_ref, fv_ref, npmf_ref,
        # carry
        t0_ref, t1_ref, t2_ref, i0_ref, i1_ref, i2_ref,
        lp_ref, bn_ref, smp_ref, inp_ref,
        f0_ref, f1_ref, f2_ref,
        ro0_ref, ro1_ref, ro2_ref, rd0_ref, rd1_ref, rd2_ref,
        # loop-invariant lanes
        pixidx_ref, pixx_ref, pixy_ref, base_ref,
        # scalars
        scal_ref, iscal_ref,
    ) = args[33:65]
    outs = args[65:]

    ox, oy, oz = ro0_ref[:], ro1_ref[:], ro2_ref[:]
    dx, dy, dz = rd0_ref[:], rd1_ref[:], rd2_ref[:]
    rd = (dx, dy, dz)
    nee_dir = (sx_ref[:], sy_ref[:], sz_ref[:])
    px, py, pz = px_ref[:], py_ref[:], pz_ref[:]
    btype = btype_ref[:]

    # ---- winner normals from the taken union row -----------------------
    cx, cy, cz = s[0][:], s[1][:], s[2][:]
    s_r = s[3][:]
    snx, sny, snz = pint.sphere_normal_values(
        cx, cy, cz, s_r, ox, oy, oz, px, py, pz
    )
    # slots 0..2 again: the union row holds the plane normal there for
    # plane winners
    pnx, pny, pnz = pint.plane_normal_values(cx, cy, cz, ox, oy, oz)
    # triangle: naive Moller-Trumbore recompute on the winner rows
    tnx, tny, tnz = pint.tri_normal_recompute(
        (cx, cy, cz),
        (s[3][:], s[4][:], s[5][:]),
        (s[6][:], s[7][:], s[8][:]),
        (s[9][:], s[10][:], s[11][:]),
        (s[12][:], s[13][:], s[14][:]),
        (s[15][:], s[16][:], s[17][:]),
        ox, oy, oz, dx, dy, dz,
    )
    is_s = btype == 0
    is_p = btype == 1
    normal = (
        jnp.where(is_s, snx, jnp.where(is_p, pnx, tnx)),
        jnp.where(is_s, sny, jnp.where(is_p, pny, tny)),
        jnp.where(is_s, snz, jnp.where(is_p, pnz, tnz)),
    )

    # ---- material values (unrolled over the SMEM material table) -------
    # slot 18 carries the winner's material id as an exact small-int f32
    cr, cg, cb, rough, metal, er, eg, eb = pint.material_values(
        n_mat, mat_color, mat_rough, mat_metal, mat_emis,
        s[18][:].astype(jnp.int32), ox.shape,
    )

    # ---- trace epilogue (shared with _finish_trace, in-register) --------
    (
        cos_theta, nee_scatter, nee_pdf_b, state, bdir, bscat, bpdf,
        bzero, cos_bounce,
    ) = trace_epilogue(
        rd, nee_dir, normal, (cr, cg, cb), rough, metal, st_ref[:]
    )

    v = dict(
        hit=hit_ref[:], occ=occ_ref[:],
        px=px, py=py, pz=pz,
        er=er, eg=eg, eb=eb,
        ct=cos_theta, ns=nee_scatter, npdf=nee_pdf_b,
        bd=bdir, bpdf=bpdf, bs=bscat,
        bz=bzero.astype(jnp.int32), cb=cos_bounce,
        state=state,
        fu=fu_ref[:], fv=fv_ref[:], npmf=npmf_ref[:],
    )
    carry = dict(
        tp=(t0_ref[:], t1_ref[:], t2_ref[:]),
        inc=(i0_ref[:], i1_ref[:], i2_ref[:]),
        last_pdf=lp_ref[:], bounce=bn_ref[:], sample=smp_ref[:],
        in_path=inp_ref[:],
        film=(f0_ref[:], f1_ref[:], f2_ref[:]),
        ro=(ox, oy, oz),
        rd=rd,
    )
    pix = (pixidx_ref[:], pixx_ref[:], pixy_ref[:], base_ref[:])
    _shade_core(
        env_w, env_h, width, height, max_bounces,
        (q0_ref[:], q1_ref[:], q2_ref[:], q3_ref[:]),
        v, carry, pix, scal_ref, iscal_ref, outs,
    )


def big_shade_call(
    scene, env_w, env_h, width, height, max_bounces,
    qwords, tr, slots, nee_dir, state, fu, fv, nee_pmf, carry,
    pixel_index, pixel_x, pixel_y, base_sample, scal, iscal,
):
    """Run the big-scene mega-shade kernel. `tr` is a dict of tiles:
    hit/occ/btype (i32) and px/py/pz; `slots` is the 19-tuple of
    winner_table slot tiles (one XLA take, union layout — see the
    section comment). Returns (new_carry, active_mask, hit_mask) like
    shade_call."""
    rows = fu.shape[0]
    grid = rows // SUBLANES
    _, _, block, smem = _tiles(rows * LANES)
    n_mat = scene.mat_roughness.shape[0]

    outs = tuple(
        jax.ShapeDtypeStruct((rows, LANES), SHADE_OUT_DTYPES.get(nm, jnp.float32))
        for nm in SHADE_OUT_NAMES
    )
    ins = (
        scene.mat_color, scene.mat_roughness, scene.mat_metallic,
        scene.mat_emission,
        qwords[0], qwords[1], qwords[2], qwords[3],
        tr["hit"], tr["occ"], tr["btype"],
        tr["px"], tr["py"], tr["pz"],
        *slots,
        nee_dir[0], nee_dir[1], nee_dir[2],
        state, fu, fv, nee_pmf,
        carry["tp0"], carry["tp1"], carry["tp2"],
        carry["inc0"], carry["inc1"], carry["inc2"],
        carry["last_pdf"], carry["bounce"], carry["sample"],
        carry["in_path"],
        carry["film0"], carry["film1"], carry["film2"],
        carry["ro0"], carry["ro1"], carry["ro2"],
        carry["rd0"], carry["rd1"], carry["rd2"],
        pixel_index, pixel_x, pixel_y, base_sample,
        scal, iscal,
    )
    res = pl.pallas_call(
        partial(
            _big_shade_kernel, n_mat, env_w, env_h, width, height,
            max_bounces,
        ),
        grid=(grid,),
        in_specs=[smem] * 4 + [block] * 59 + [smem, smem],
        out_specs=tuple(block for _ in outs),
        out_shape=outs,
        interpret=pint._interpret(),
    )(*ins)
    out = dict(zip(SHADE_OUT_NAMES, res))
    new_carry = {k: out[k] for k in SHADE_OUT_NAMES[:-2]}
    return new_carry, out["active"], out["hitmask"]
