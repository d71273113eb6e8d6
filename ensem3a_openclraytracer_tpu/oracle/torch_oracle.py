"""Reference CPU autodiff estimator in PyTorch.

An *independent* implementation of the exact same Monte-Carlo estimator
as :mod:`ensem3a_openclraytracer_tpu.models.pathtracer` (which itself
reproduces the reference's Raytracing.cl semantics) - used to validate
both the rendered image and the pixel gradients of the TPU renderer
(BASELINE.json: "pixel-gradient max-abs-error vs a CPU autodiff
reference").  It consumes the same explicit ``uniforms`` stream
(``[spp, max_bounce + 1, N, 2]``), so with matching inputs the two
implementations must agree to float32 tolerance; torch.autograd supplies
the reference gradients w.r.t. material color / roughness (emissive
power), sun power, IBL power, and IBL texels.

Deliberately written against torch tensors only - no JAX imports - so a
bug in the JAX code cannot leak into the oracle.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import torch

MAX_DIST = 1000.0
MIN_HIT_DIST = 1e-4
MT_EPSILON = 1e-7
PI = float(np.float32(np.pi))

EMISSIVE, DIFFUSE, GLOSSY, GLASS = 0, 1, 2, 3


def _f32(x):
    return torch.as_tensor(np.asarray(x, np.float32))


def euler_xyz_matrix(angles_deg: torch.Tensor) -> torch.Tensor:
    a = angles_deg * (math.pi / 180.0)
    cx, sx = torch.cos(a[0]), torch.sin(a[0])
    cy, sy = torch.cos(a[1]), torch.sin(a[1])
    cz, sz = torch.cos(a[2]), torch.sin(a[2])
    rx = torch.stack([
        torch.stack([torch.ones_like(cx), torch.zeros_like(cx), torch.zeros_like(cx)]),
        torch.stack([torch.zeros_like(cx), cx, -sx]),
        torch.stack([torch.zeros_like(cx), sx, cx]),
    ])
    ry = torch.stack([
        torch.stack([cy, torch.zeros_like(cy), sy]),
        torch.stack([torch.zeros_like(cy), torch.ones_like(cy), torch.zeros_like(cy)]),
        torch.stack([-sy, torch.zeros_like(cy), cy]),
    ])
    rz = torch.stack([
        torch.stack([cz, -sz, torch.zeros_like(cz)]),
        torch.stack([sz, cz, torch.zeros_like(cz)]),
        torch.stack([torch.zeros_like(cz), torch.zeros_like(cz), torch.ones_like(cz)]),
    ])
    return rz @ ry @ rx


def camera_rays(position, rot_deg, fov_deg, height: int, width: int):
    position = _f32(position)
    fov_rad = _f32(fov_deg) * (math.pi / 180.0)
    f = 1.0 / (2.0 * torch.tan(fov_rad / 2.0))
    rows = (torch.arange(height, dtype=torch.float32) + 0.5) / height
    cols = (torch.arange(width, dtype=torch.float32) + 0.5) / width
    px = cols - 0.5
    pz = (0.5 - rows) * (height / width)
    gz, gx = torch.meshgrid(pz, px, indexing="ij")  # [H, W]
    local = torch.stack([gx, torch.full_like(gx, float(f)), gz], dim=-1)
    m = euler_xyz_matrix(_f32(rot_deg))
    d = torch.einsum("ij,hwj->hwi", m, local)
    d = d / d.norm(dim=-1, keepdim=True)
    d = d.reshape(-1, 3)
    o = position.expand_as(d)
    return o, d


def trace(v0, v1, v2, ray_o, ray_d):
    """Brute-force Moller-Trumbore closest hit. [N,3] x [T,3] -> per-ray."""
    e1 = (v1 - v0)[None]  # [1, T, 3]
    e2 = (v2 - v0)[None]
    ro = ray_o[:, None, :]
    rd = ray_d[:, None, :]
    h = torch.cross(rd.expand(-1, e2.shape[1], -1), e2.expand(ro.shape[0], -1, -1), dim=-1)
    det = (e1 * h).sum(-1)
    parallel = det.abs() < MT_EPSILON
    inv_det = 1.0 / torch.where(parallel, torch.ones_like(det), det)
    s = ro - v0[None]
    u = inv_det * (s * h).sum(-1)
    q = torch.cross(s.expand(-1, e1.shape[1], -1), e1.expand(ro.shape[0], -1, -1), dim=-1)
    v = inv_det * (rd * q).sum(-1)
    t = inv_det * (e2 * q).sum(-1)
    hit = (~parallel) & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > MT_EPSILON)
    hit = hit & (t > MIN_HIT_DIST)
    t = torch.where(hit, t, torch.full_like(t, MAX_DIST))
    best_t, best_i = t.min(dim=1)
    return best_t, best_i, best_t < MAX_DIST


def orthonormal_basis(n):
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    sign = torch.where(nz >= 0.0, torch.ones_like(nz), -torch.ones_like(nz))
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    t = torch.stack([1.0 + sign * nx * nx * a, sign * b, -sign * nx], dim=-1)
    bt = torch.stack([b, sign + ny * ny * a, -ny], dim=-1)
    return t, bt


def local_to_world(local_v, n):
    t, bt = orthonormal_basis(n)
    return t * local_v[..., :1] + bt * local_v[..., 1:2] + n * local_v[..., 2:3]


def sample_cosine(n, u1, u2):
    # mirrors ops/sampling.sample_hemisphere_cosine: the local sample is
    # unit by construction, cos_theta == local z == sqrt(1 - u1)
    r = torch.sqrt(u1)
    phi = 2.0 * PI * u2
    z = (1.0 - u1).clamp(min=0.0).sqrt()
    local = torch.stack([r * torch.cos(phi), r * torch.sin(phi), z], dim=-1)
    d = local_to_world(local, n)
    inv_pdf = PI / z.clamp(min=1e-6)
    return d, inv_pdf


def sample_uniform(n, u1, u2):
    # mirrors ops/sampling.sample_hemisphere_uniform: u2 = azimuth,
    # u1 = polar (same roles as sample_cosine)
    phi = 2.0 * PI * u2
    cos_t = 1.0 - u1
    sin_t = torch.sqrt((1.0 - cos_t * cos_t).clamp(min=0.0))
    local = torch.stack(
        [torch.cos(phi) * sin_t, torch.sin(phi) * sin_t, cos_t], dim=-1
    )
    d = local_to_world(local, n)
    return d, torch.full_like(cos_t, 2.0 * PI)


def eval_ggx(color, roughness, v, l, n):
    h = l + v
    h = h / h.norm(dim=-1, keepdim=True).clamp(min=1e-20)
    alpha_sqr = roughness**2
    ndoth = (n * h).sum(-1).clamp(min=0.0)
    d = alpha_sqr / (PI * ((ndoth**2) * (alpha_sqr - 1.0) + 1.0) ** 2).clamp(min=1e-12)
    k = roughness * math.sqrt(2.0 / PI)
    ndotv = (n * v).sum(-1).clamp(min=0.0)
    g1 = ndotv / (ndotv * (1.0 - k) + k).clamp(min=1e-12)
    ndotl = (n * l).sum(-1).clamp(min=0.0)
    g2 = ndotl / (ndotl * (1.0 - k) + k).clamp(min=1e-12)
    f0 = 0.04
    f = f0 + (1.0 - f0) * (1.0 - (h * v).sum(-1).clamp(min=0.0)) ** 5
    specular = (f * g1 * g2 * d) / (4.0 * ndotv * ndotl).clamp(min=1e-3)
    kd = (1.0 - f) * 0.5
    return kd[..., None] * color / PI + specular[..., None]


def sample_glass_refract(in_dir, n, ior, u1):
    """Snell + Schlick-Fresnel glass (the glass_mode="refract" upgrade);
    independent torch derivation of ops/bsdf.sample_glass_refract."""
    cos_raw = (in_dir * n).sum(-1)
    entering = cos_raw < 0.0
    n_eff = torch.where(entering[..., None], n, -n)
    ci = (-(in_dir * n_eff).sum(-1)).clamp(0.0, 1.0)
    eta = torch.where(entering, 1.0 / ior, ior)
    k = 1.0 - eta * eta * (1.0 - ci * ci)
    tir = k < 0.0
    ct = k.clamp(min=0.0).sqrt()
    refr = in_dir * eta[..., None] + n_eff * (eta * ci - ct)[..., None]
    refr = refr / refr.norm(dim=-1, keepdim=True).clamp(min=1e-20)
    refl = in_dir + n_eff * (2.0 * ci)[..., None]
    # exact unpolarized dielectric Fresnel (see ops/bsdf.py note)
    rs = (eta * ci - ct) / (eta * ci + ct).clamp(min=1e-12)
    rp = (eta * ct - ci) / (eta * ct + ci).clamp(min=1e-12)
    fres = 0.5 * (rs * rs + rp * rp)
    reflect = tir | (u1 < fres)
    return torch.where(reflect[..., None], refl, refr)


def spherical_uv(d):
    d = d / d.norm(dim=-1, keepdim=True)
    rx, ry, rz = d[..., 1], -d[..., 2], -d[..., 0]
    u = torch.atan2(rz, rx) * (0.5 / PI) + 0.5
    v = torch.asin(ry.clamp(-1.0, 1.0)) * (1.0 / PI) + 0.5
    return u, v


def sample_ibl(ibl, d):
    h, w = ibl.shape[0], ibl.shape[1]
    u, v = spherical_uv(d)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = torch.floor(x)
    y0 = torch.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.long().clamp(0, w - 1)
    x1i = (x0i + 1).clamp(0, w - 1)
    y0i = y0.long().clamp(0, h - 1)
    y1i = (y0i + 1).clamp(0, h - 1)
    c00, c01 = ibl[y0i, x0i], ibl[y0i, x1i]
    c10, c11 = ibl[y1i, x0i], ibl[y1i, x1i]
    top = c00 * (1 - fx) + c01 * fx
    bot = c10 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def sun_direction(sun_angles_deg):
    v = torch.ones(3)
    m = euler_xyz_matrix(_f32(sun_angles_deg))
    d = m @ v
    return d / d.norm()


def render_radiance_torch(
    v0,
    v1,
    v2,
    face_n,
    face_mat,
    mtype,
    color,
    roughness,
    ior,
    sun_angles_deg,
    sun_power,
    ibl_power,
    ibl,
    cam_position,
    cam_rotation_deg,
    cam_fov_deg,
    uniforms,
    *,
    height: int,
    width: int,
    max_bounce: int,
    sun_enabled: bool = True,
    glass_mode: str = "tint",
    nee: bool = False,
    mis: bool = False,
    lights=None,
    light_uniforms=None,
):
    """Radiance image ``[H, W, 3]`` as a torch tensor (autograd-ready).

    ``color [M, 3]``, ``roughness [M]``, ``sun_power``, ``ibl_power`` and
    ``ibl [Hi, Wi, 3]`` may be tensors with ``requires_grad=True``.
    ``uniforms`` is ``[spp, max_bounce + 1, N, 2]`` float32 - the same
    stream handed to the JAX estimator.

    ``nee=True`` mirrors ``pathtracer.nee_contribution``: one
    area-sampled shadow ray per diffuse/glossy vertex with binary
    emission suppression at the next vertex; ``mis=True`` the balance
    heuristic combination.  ``lights`` is ``(lv0, lv1, lv2, ln, larea,
    lmat)`` arrays; ``light_uniforms`` is ``[spp, max_bounce + 1, N, 3]``
    - the same stream as the JAX estimator's."""
    v0, v1, v2, face_n = _f32(v0), _f32(v1), _f32(v2), _f32(face_n)
    ior = _f32(ior)
    face_mat = torch.as_tensor(np.asarray(face_mat, np.int64))
    mtype_t = torch.as_tensor(np.asarray(mtype, np.int64))
    uniforms = _f32(uniforms)
    spp = uniforms.shape[0]
    n_rays = height * width
    if mis and not nee:
        raise ValueError("mis=True requires nee=True")
    if nee:
        if lights is None or light_uniforms is None:
            raise ValueError("nee=True needs lights and light_uniforms")
        lv0, lv1, lv2 = _f32(lights[0]), _f32(lights[1]), _f32(lights[2])
        ln, larea = _f32(lights[3]), _f32(lights[4])
        lmat = torch.as_tensor(np.asarray(lights[5], np.int64))
        n_lights = lv0.shape[0]
        light_uniforms = _f32(light_uniforms)
    if mis:
        face_area = 0.5 * torch.cross(v1 - v0, v2 - v0, dim=-1).norm(dim=-1)

    ray_o, ray_d = camera_rays(cam_position, cam_rotation_deg, cam_fov_deg, height, width)
    pt, pi, phit = trace(v0, v1, v2, ray_o, ray_d)

    def surface(origin, direction, t, idx):
        midx = face_mat[idx]
        return {
            "p": origin + direction * t[:, None],
            "n": face_n[idx],
            "mtype": mtype_t[midx],
            "color": color[midx],
            "rough": roughness[midx],
            "ior": ior[midx],
        }

    env_radiance = lambda d: sample_ibl(ibl, d) * ibl_power
    sdir = sun_direction(sun_angles_deg).expand(n_rays, 3)
    primary_miss = torch.where(phit[:, None], torch.zeros(1), env_radiance(ray_d))

    def nee_contribution(live, thr, in_dir, surf, ul):
        """Mirror of pathtracer.nee_contribution (same uniform roles)."""
        u3, u4, u5 = ul[:, 0], ul[:, 1], ul[:, 2]
        li = (u3 * n_lights).long().clamp(0, n_lights - 1)
        lpow = roughness[lmat[li]]
        s_ = torch.sqrt(u4)
        x = (
            lv0[li]
            + (lv1[li] - lv0[li]) * (1.0 - s_)[:, None]
            + (lv2[li] - lv0[li]) * (u5 * s_)[:, None]
        )
        delta = x - surf["p"]
        dist2 = (delta * delta).sum(-1).clamp(min=1e-8)
        dist = dist2.sqrt()
        ldir = (delta / dist[:, None]).detach()
        cos_s = (ldir * surf["n"]).sum(-1)
        cos_l = (ldir * ln[li]).sum(-1).abs()
        st, _, _ = trace(v0, v1, v2, surf["p"], ldir)
        visible = st >= dist * (1.0 - 1e-3)
        is_glossy = surf["mtype"] == GLOSSY
        brdf = torch.where(
            is_glossy[:, None],
            eval_ggx(surf["color"], surf["rough"], -in_dir, ldir, surf["n"]),
            surf["color"] / PI,
        )
        weight = (n_lights * larea[li]) * cos_l / dist2
        sampled = live & (surf["mtype"] != EMISSIVE) & (surf["mtype"] != GLASS)
        ok = sampled & visible & (cos_s > 0.0) & (cos_l > 1e-6)
        contrib = thr * brdf * (cos_s.clamp(min=0.0) * weight * lpow)[:, None]
        if mis:
            p_b = torch.where(
                is_glossy, torch.full_like(cos_s, 1.0 / (2.0 * PI)),
                cos_s.clamp(min=0.0) / PI,
            )
            contrib = contrib / (1.0 + p_b * weight)[:, None]
        return torch.where(ok[:, None], contrib, torch.zeros(1)), sampled

    acc = torch.zeros(n_rays, 3)
    for s in range(spp):
        live = phit.clone()
        thr = torch.ones(n_rays, 3)
        rad = primary_miss.clone()
        in_dir = ray_d
        surf = surface(ray_o, ray_d, pt, pi)
        emis_w = torch.ones(n_rays)
        for j in range(max_bounce + 1):
            u = uniforms[s, j]
            u1, u2 = u[:, 0], u[:, 1]

            emis = live & (surf["mtype"] == EMISSIVE)
            rad = rad + torch.where(
                emis[:, None],
                thr * (surf["rough"] * emis_w)[:, None],
                torch.zeros(1),
            )
            live = live & ~emis

            if nee:
                direct, sampled = nee_contribution(
                    live, thr, in_dir, surf, light_uniforms[s, j]
                )
                rad = rad + direct
                if not mis:
                    emis_w = torch.where(live, 1.0 - sampled.float(), emis_w)

            d_diff, ip_diff = sample_cosine(surf["n"], u1, u2)
            d_unif, ip_unif = sample_uniform(surf["n"], u1, u2)
            is_glossy = surf["mtype"] == GLOSSY
            is_glass = surf["mtype"] == GLASS
            if glass_mode == "refract":
                d_glass = sample_glass_refract(in_dir, surf["n"], surf["ior"], u1)
            else:
                d_glass = in_dir
            bdir = torch.where(
                is_glass[:, None],
                d_glass,
                torch.where(is_glossy[:, None], d_unif, d_diff),
            ).detach()
            cos_abs = (bdir * surf["n"]).sum(-1).abs()
            f_diff = (surf["color"] / PI) * (ip_diff * cos_abs)[:, None]
            f_glossy = eval_ggx(surf["color"], surf["rough"], -in_dir, bdir, surf["n"]) * (
                ip_unif * cos_abs
            )[:, None]
            f_glass = surf["color"]
            factor = torch.where(
                is_glass[:, None],
                f_glass,
                torch.where(is_glossy[:, None], f_glossy, f_diff),
            )
            thr = torch.where(live[:, None], thr * factor, thr)

            bt, bi, bhit = trace(v0, v1, v2, surf["p"], bdir)
            miss = live & ~bhit

            env_light = env_radiance(bdir)
            if sun_enabled:
                st, si, shit = trace(v0, v1, v2, surf["p"], sdir)
                smat = mtype_t[face_mat[si]]
                scol = color[face_mat[si]]
                unoccluded = (~shit) & (surf["mtype"] != GLASS)
                glass_occ = shit & (smat == GLASS)
                sun_light = (
                    unoccluded[:, None].float() * sun_power
                    + glass_occ[:, None].float() * scol * sun_power
                )
            else:
                sun_light = torch.zeros_like(env_light)
            rad = rad + torch.where(
                miss[:, None], thr * (sun_light + env_light), torch.zeros(1)
            )
            live = live & bhit

            new_surf = surface(surf["p"], bdir, bt, bi)
            if mis:
                p_b = torch.where(
                    surf["mtype"] == GLOSSY,
                    torch.full_like(bt, 1.0 / (2.0 * PI)),
                    (bdir * surf["n"]).sum(-1).clamp(min=0.0) / PI,
                )
                cos_l = (bdir * new_surf["n"]).sum(-1).abs()
                p_nee_hit = (bt * bt) / (
                    n_lights * face_area[bi] * cos_l.clamp(min=1e-6)
                )
                w_b = p_b / (p_b + p_nee_hit)
                emis_w = torch.where(
                    live, torch.where(sampled, w_b, torch.ones_like(w_b)),
                    emis_w,
                )
            lm = live[:, None]
            surf = {
                "p": torch.where(lm, new_surf["p"], surf["p"]),
                "n": torch.where(lm, new_surf["n"], surf["n"]),
                "mtype": torch.where(live, new_surf["mtype"], surf["mtype"]),
                "color": torch.where(lm, new_surf["color"], surf["color"]),
                "rough": torch.where(live, new_surf["rough"], surf["rough"]),
                "ior": torch.where(live, new_surf["ior"], surf["ior"]),
            }
            in_dir = torch.where(lm, bdir, in_dir)

        final_emis = live & (surf["mtype"] == EMISSIVE)
        rad = rad + torch.where(
            final_emis[:, None],
            thr * (surf["rough"] * emis_w)[:, None],
            torch.zeros(1),
        )
        acc = acc + rad

    return (acc / spp).reshape(height, width, 3)


def render_scene_arrays(geom, materials, env, camera, uniforms, *, height, width,
                        max_bounce, sun_enabled=True, requires_grad=False,
                        glass_mode="tint", nee=False, mis=False, lights=None,
                        light_uniforms=None):
    """Convenience wrapper taking the JAX pytrees (converted via numpy).

    Returns ``(image, params)`` where ``params`` is the dict of leaf
    tensors (with ``requires_grad`` set as asked) for autograd access.
    ``lights`` may be a JAX :class:`LightPack`; it is unpacked to the
    plain arrays the torch estimator consumes."""
    params = {
        "color": _f32(np.asarray(materials.color)).requires_grad_(requires_grad),
        "roughness": _f32(np.asarray(materials.roughness)).requires_grad_(requires_grad),
        "sun_power": _f32(np.asarray(env.sun_power)).requires_grad_(requires_grad),
        "ibl_power": _f32(np.asarray(env.ibl_power)).requires_grad_(requires_grad),
        "ibl": _f32(np.asarray(env.ibl)).requires_grad_(requires_grad),
    }
    img = render_radiance_torch(
        np.asarray(geom.v0), np.asarray(geom.v1), np.asarray(geom.v2),
        np.asarray(geom.n), np.asarray(geom.mat),
        np.asarray(materials.mtype),
        params["color"], params["roughness"],
        np.asarray(materials.ior),
        np.asarray(env.sun_angles_deg), params["sun_power"],
        params["ibl_power"], params["ibl"],
        np.asarray(camera.position), np.asarray(camera.rotation_deg),
        np.asarray(camera.fov_deg),
        uniforms,
        height=height, width=width, max_bounce=max_bounce, sun_enabled=sun_enabled,
        glass_mode=glass_mode,
        nee=nee, mis=mis,
        lights=None if lights is None else (
            np.asarray(lights.v0), np.asarray(lights.v1),
            np.asarray(lights.v2), np.asarray(lights.n),
            np.asarray(lights.area), np.asarray(lights.mat),
        ),
        light_uniforms=light_uniforms,
    )
    return img, params
