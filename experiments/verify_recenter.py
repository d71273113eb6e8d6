"""Validate per-block recentering as the fix for bf16 intersection noise.

Emulates the MXU's bf16 operand truncation in numpy and measures, on
Monkey bounce rays, the inside-test + hit error rate of:
  1. global-frame bf16 (the current production scheme)
  2. per-block recentered bf16 (features about the block centroid)
against exact f64.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import numpy as np
import ml_dtypes

from ensem3a_openclraytracer_tpu.scene.objloader import load_obj
from ensem3a_openclraytracer_tpu.scene.scene import morton_order

MIN_HIT_DIST = 1e-4


def bf16(x):
    return np.asarray(x, np.float32).astype(ml_dtypes.bfloat16).astype(np.float32)


mesh = load_obj("/root/reference/ObjFiles/Cornell box_Monkey.obj")
fd = mesh.face_data
v0, v1, v2 = mesh.v_p[fd[:, 7]], mesh.v_p[fd[:, 8]], mesh.v_p[fd[:, 9]]
order = morton_order(v0, v1, v2)
v0 = np.asarray(v0[order], np.float64)
v1 = np.asarray(v1[order], np.float64)
v2 = np.asarray(v2[order], np.float64)
T = len(v0)
TT = 256
nb = (T + TT - 1) // TT

rng = np.random.default_rng(0)
n = 4096
ti = rng.integers(0, T, n)
r1, r2 = rng.random(n), rng.random(n)
s = np.sqrt(r1)
p = (v0[ti] * (1 - s)[:, None] + v1[ti] * (s * (1 - r2))[:, None]
     + v2[ti] * (s * r2)[:, None])
d = rng.normal(size=(n, 3))
d /= np.linalg.norm(d, axis=1, keepdims=True)
o = p + 1e-4 * d


def exact_trace(o, d):
    """f64 brute force closest hit."""
    best_t = np.full(n, 1e30)
    best_i = np.zeros(n, np.int64)
    for lo in range(0, T, 2048):
        hi = min(lo + 2048, T)
        A, B, C = v0[lo:hi], v1[lo:hi], v2[lo:hi]
        nrm = np.cross(B - A, C - A)  # [t, 3]
        den = d @ nrm.T  # [n, t]
        num = (nrm * A).sum(1)[None] - o @ nrm.T
        t = num / np.where(den == 0, 1, den)
        # side tests (exact)
        w1 = np.einsum("ntk,nk->nt",
                       np.cross((A[None] - o[:, None]), (B[None] - o[:, None])), d)
        w2 = np.einsum("ntk,nk->nt",
                       np.cross((B[None] - o[:, None]), (C[None] - o[:, None])), d)
        w3 = np.einsum("ntk,nk->nt",
                       np.cross((C[None] - o[:, None]), (A[None] - o[:, None])), d)
        inside = ((w1 >= 0) & (w2 >= 0) & (w3 >= 0)) | (
            (w1 <= 0) & (w2 <= 0) & (w3 <= 0))
        ok = inside & (den != 0) & (t > MIN_HIT_DIST)
        t = np.where(ok, t, 1e30)
        j = t.argmin(1)
        tm = t[np.arange(n), j]
        upd = tm < best_t
        best_i = np.where(upd, lo + j, best_i)
        best_t = np.where(upd, tm, best_t)
    return best_t, best_i, best_t < 1e29


def mxu_trace(o, d, recenter, split_edges=False):
    """Emulate the bf16 MXU kernel: per-block, w via bf16 Plucker rows and
    t via 2-term split-bf16 num/den.  recenter=True shifts each block's
    frame to its centroid.  split_edges=True uses the 3-term split-bf16
    product for the side tests too."""
    o32 = np.asarray(o, np.float32)
    d32 = np.asarray(d, np.float32)
    best_t = np.full(n, 1e30, np.float32)
    best_i = np.zeros(n, np.int64)
    for b in range(nb):
        lo, hi = b * TT, min((b + 1) * TT, T)
        A = np.asarray(v0[lo:hi], np.float32)
        B = np.asarray(v1[lo:hi], np.float32)
        C = np.asarray(v2[lo:hi], np.float32)
        c = (np.concatenate([A, B, C]).mean(0) if recenter
             else np.zeros(3, np.float32)).astype(np.float32)
        A, B, C = A - c, B - c, C - c
        oc = o32 - c
        # ray features (f32, then bf16-rounded as MXU operands)
        dxo = np.cross(d32, oc).astype(np.float32)
        r6 = np.concatenate([d32, dxo], 1)  # [n, 6]
        q4 = np.concatenate([oc, np.ones((n, 1), np.float32)], 1)

        def split(x):
            h = bf16(x)
            return h, bf16(x - h)

        # edges: single bf16 pass
        def ef(X, Y):
            return np.concatenate([np.cross(X, Y), X - Y], 1)  # [t, 6]

        w = []
        for X, Y in ((A, B), (B, C), (C, A)):
            e = ef(X, Y)
            if split_edges:
                e_hi, e_lo = split(e)
                r_hi, r_lo = split(r6)
                w.append(r_hi @ e_hi.T + r_lo @ e_hi.T + r_hi @ e_lo.T)
            else:
                w.append(bf16(r6) @ bf16(e).T)  # f32 accum of bf16 products
        w1, w2, w3 = w
        inside = ((w1 >= 0) & (w2 >= 0) & (w3 >= 0)) | (
            (w1 <= 0) & (w2 <= 0) & (w3 <= 0))
        # num/den: 3-term split-bf16 (production build_pnd scheme)
        nrm = np.cross(B - A, C - A).astype(np.float32)
        pl4 = np.concatenate([-nrm, (nrm * A).sum(1)[:, None]], 1)  # [t, 4]
        p_hi, p_lo = split(pl4)
        q_hi, q_lo = split(q4)
        num = q_hi @ p_hi.T + q_lo @ p_hi.T + q_hi @ p_lo.T
        n_hi, n_lo = split(nrm)
        d_hi, d_lo = split(d32)
        den = d_hi @ n_hi.T + d_lo @ n_hi.T + d_hi @ n_lo.T
        t = num / np.where(den == 0, 1, den)
        ok = inside & (den != 0) & (t > MIN_HIT_DIST)
        t = np.where(ok, t, 1e30)
        j = t.argmin(1)
        tm = t[np.arange(n), j]
        upd = tm < best_t
        best_i = np.where(upd, lo + j, best_i)
        best_t = np.where(upd, tm, best_t)
    return best_t, best_i, best_t < 1e29


te, ie, he = exact_trace(o, d)
for rc, se in ((False, False), (True, False), (False, True), (True, True)):
    tm, im, hm = mxu_trace(o, d, rc, se)
    both = he & hm
    rel = np.abs(tm - te) / np.maximum(np.abs(te), 1e-9)
    print(f"recenter={rc} split_edges={se}: "
          f"hit mismatch {(he != hm).sum()}/{n}, "
          f"tri same {(im[both] == ie[both]).mean():.4f}, "
          f"t rel p50 {np.percentile(rel[both], 50):.2e} "
          f"p99 {np.percentile(rel[both], 99):.2e} max {rel[both].max():.2e}")
