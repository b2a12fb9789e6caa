"""Independent float64 numpy transcription of the reference CUDA rasterizer math.

This module is the *golden parity oracle*: a from-scratch, pure-numpy
re-statement of the reference kernels, deliberately independent of
`eogs2_tpu.ops` (it shares no code, layout, or algorithm with the JAX/Pallas
implementation — it rasterizes per tile with explicit sequential compositing,
exactly like the CUDA kernels do).

Transcribed semantics (citations into /root/reference):
  forward preprocess   submodules/diff-gaussian-rasterization/cuda_rasterizer/forward.cu:155-281
  forward render       forward.cu:288-411
  backward render      backward.cu:457-643
  backward cov2D/T     backward.cu:147-327   (dL_dT written CORRECTLY per
                       gaussian; the reference's `dL_dT[idx+k]` indexing bug at
                       backward.cu:320-325 is intentionally not reproduced)
  backward cov3D       backward.cu:331-394
  backward mean        backward.cu:439-445
  helpers              auxiliary.h:40-78 (ndc2Pix, getRect, transformPoint4x3)

Conventions bridged to the eogs2_tpu public API:
  * the reference takes a transposed 4x4 "viewmatrix" V = A^T; here we take the
    [3,4] affine A directly (rows: u_ndc, v_ndc, altitude), so
    p_proj = A @ [p,1], W_glm = A_lin^T, T_glm = W_glm @ NDC2Screen.
  * depth (sort key) = 200 - altitude (forward.cu:262-272), float32-cast for
    ordering exactly like the device's radix sort on float bits; ties keep
    emission (gaussian-major, rect row-major) order — cub's sort is stable.
  * quaternions are used UNNORMALIZED (forward.cu:126-131 comments the
    normalization out), order (r, x, y, z).
  * alpha = min(0.99, conic_opacity_w * exp(power)); skip if power > 0 or
    alpha < 1/255; stop the pixel when T*(1-alpha) < 1e-4 (forward.cu:360-377).
    The backward ignores the min(0.99,.) clamp derivative (backward.cu:574).

Everything is computed in float64 except the sort keys.
"""

import numpy as np

BLOCK = 16  # config.h:16-17 (BLOCK_X = BLOCK_Y = 16)
H_VAR = 0.3  # dilation, forward.cu:224
T_EPS = 1e-4  # early-exit transmittance, forward.cu:373
ALPHA_MIN = 1.0 / 255.0  # forward.cu:369


def _quat_to_R(quats):
    """glm R matrix of forward.cu:133-138, math row-major [N,3,3].

    glm stores columns; the math matrix here is R[i][j] = col_j[i], which is
    the transpose of the textbook quat->R (matching the device bit-for-bit).
    """
    r, x, y, z = (quats[:, i] for i in range(4))
    R = np.empty(quats.shape[:1] + (3, 3), np.float64)
    R[:, 0, 0] = 1 - 2 * (y * y + z * z)
    R[:, 0, 1] = 2 * (x * y + r * z)
    R[:, 0, 2] = 2 * (x * z - r * y)
    R[:, 1, 0] = 2 * (x * y - r * z)
    R[:, 1, 1] = 1 - 2 * (x * x + z * z)
    R[:, 1, 2] = 2 * (y * z + r * x)
    R[:, 2, 0] = 2 * (x * z + r * y)
    R[:, 2, 1] = 2 * (y * z - r * x)
    R[:, 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def _cov3d(scales, quats):
    """Sigma = (S R)^T (S R), forward.cu:117-151. Returns [N,3,3]."""
    R = _quat_to_R(quats)
    M = scales[:, :, None] * R  # S @ R with S diagonal
    return np.einsum("nki,nkj->nij", M, M)


def _T_math(affine, width, height):
    """T_glm = W_glm @ NDC2Screen as a math matrix: A_lin^T @ diag(W/2,H/2,1)."""
    N2S = np.diag([width / 2.0, height / 2.0, 1.0])
    return affine[:, :3].T @ N2S  # [3,3]


def preprocess(means, scales, quats, opacities, affine, width, height,
               antialiasing=False):
    """forward.cu:155-281 for every gaussian. Returns dict of [N] arrays."""
    n = means.shape[0]
    p_proj = means @ affine[:, :3].T + affine[:, 3]  # transformPoint4x3
    px = ((p_proj[:, 0] + 1.0) * width - 1.0) * 0.5  # ndc2Pix, auxiliary.h:40
    py = ((p_proj[:, 1] + 1.0) * height - 1.0) * 0.5
    depth = 200.0 - p_proj[:, 2]

    Sigma = _cov3d(scales, quats)
    T = _T_math(affine, width, height)
    cov_full = T.T @ np.einsum("nij,jk->nik", Sigma, T)  # T^T Vrk T per gaussian
    cxx = cov_full[:, 0, 0].copy()
    cxy = cov_full[:, 0, 1].copy()
    cyy = cov_full[:, 1, 1].copy()

    det_cov = cxx * cyy - cxy * cxy
    cxx = cxx + H_VAR
    cyy = cyy + H_VAR
    det = cxx * cyy - cxy * cxy  # det_cov_plus_h_cov
    h_scaling = np.ones(n)
    if antialiasing:
        h_scaling = np.sqrt(np.maximum(0.000025, det_cov / det))

    ok = det != 0.0
    det_inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    conic = np.stack([cyy * det_inv, -cxy * det_inv, cxx * det_inv], 1)

    mid = 0.5 * (cxx + cyy)
    lam1 = mid + np.sqrt(np.maximum(0.1, mid * mid - det))
    radius = np.ceil(3.0 * np.sqrt(np.maximum(lam1, mid - np.sqrt(np.maximum(0.1, mid * mid - det)))))

    gx = (width + BLOCK - 1) // BLOCK
    gy = (height + BLOCK - 1) // BLOCK
    # getRect, auxiliary.h:45-55 (int() truncates toward zero; the max(0,.)
    # clamp makes the negative-truncation direction irrelevant)
    rect_min_x = np.clip(((px - radius) / BLOCK).astype(np.int64), 0, gx)
    rect_min_y = np.clip(((py - radius) / BLOCK).astype(np.int64), 0, gy)
    rect_max_x = np.clip(((px + radius + BLOCK - 1) / BLOCK).astype(np.int64), 0, gx)
    rect_max_y = np.clip(((py + radius + BLOCK - 1) / BLOCK).astype(np.int64), 0, gy)
    tiles = (rect_max_x - rect_min_x) * (rect_max_y - rect_min_y)
    ok = ok & (tiles > 0)
    radius = np.where(ok, radius, 0.0)

    return dict(
        px=px, py=py, depth=depth, conic=conic,
        con_w=opacities * h_scaling, h_scaling=h_scaling,
        cxx=cxx, cxy=cxy, cyy=cyy, det_cov=det_cov, det=det,
        radius=radius.astype(np.int64), ok=ok,
        rect=(rect_min_x, rect_min_y, rect_max_x, rect_max_y),
        grid=(gx, gy), Sigma=Sigma, T=T,
    )


def emit_sorted_pairs(prep):
    """duplicateWithKeys + stable radix sort (rasterizer_impl.cu:70-111,303-311).

    Emission order is gaussian-major, rect-row-major (one thread per gaussian
    writes its rect's tiles contiguously at its scanned offset). Keys are
    (tileID, float32 bits of depth); cub's radix sort is stable, so np's
    stable sort over the same key tuple reproduces the device order.
    Returns (tile_id[R], gauss_idx[R]) sorted.
    """
    rmx, rmy, rxx, rxy = prep["rect"]
    gx = prep["grid"][0]
    tile_ids, gauss = [], []
    for i in np.nonzero(prep["ok"])[0]:
        for ty in range(rmy[i], rxy[i]):
            for tx in range(rmx[i], rxx[i]):
                tile_ids.append(ty * gx + tx)
                gauss.append(i)
    tile_ids = np.asarray(tile_ids, np.int64)
    gauss = np.asarray(gauss, np.int64)
    key_depth = prep["depth"].astype(np.float32)[gauss]
    order = np.lexsort((key_depth, tile_ids))  # stable, last key primary
    return tile_ids[order], gauss[order]


def _tile_pixels(tile, gx, width, height):
    ty, tx = divmod(tile, gx)
    xs = np.arange(tx * BLOCK, min(tx * BLOCK + BLOCK, width))
    ys = np.arange(ty * BLOCK, min(ty * BLOCK + BLOCK, height))
    pxs, pys = np.meshgrid(xs, ys)  # [h,w]
    return pxs.ravel().astype(np.float64), pys.ravel().astype(np.float64), xs, ys


def render(means, scales, quats, opacities, features, affine, bg,
           width, height, antialiasing=False):
    """Full forward: preprocess + per-tile sequential blend (forward.cu:288-411).

    Returns dict with image [C,H,W], final_T [H,W], n_contrib [H,W], plus the
    preprocess dict and the sorted pair lists (needed by backward()).
    """
    prep = preprocess(means, scales, quats, opacities, affine, width, height,
                      antialiasing)
    tile_ids, gauss = emit_sorted_pairs(prep)
    C = features.shape[1]
    image = np.zeros((C, height, width))
    final_T = np.ones((height, width))
    n_contrib = np.zeros((height, width), np.int64)
    gx = prep["grid"][0]

    for tile in np.unique(tile_ids):
        sel = np.nonzero(tile_ids == tile)[0]
        glist = gauss[sel]
        pxs, pys, xs, ys = _tile_pixels(tile, gx, width, height)
        npix = pxs.size
        T = np.ones(npix)
        Cacc = np.zeros((C, npix))
        done = np.zeros(npix, bool)
        last = np.zeros(npix, np.int64)
        for k, g in enumerate(glist):
            d_x = prep["px"][g] - pxs
            d_y = prep["py"][g] - pys
            cx, cy, cz = prep["conic"][g]
            power = -0.5 * (cx * d_x * d_x + cz * d_y * d_y) - cy * d_x * d_y
            alpha = np.minimum(0.99, prep["con_w"][g] * np.exp(power))
            skip = (power > 0.0) | (alpha < ALPHA_MIN)
            test_T = T * (1.0 - alpha)
            newly_done = (~done) & (~skip) & (test_T < T_EPS)
            done = done | newly_done
            lives = (~done) & (~skip) & ~newly_done
            w = np.where(lives, alpha * T, 0.0)
            Cacc += features[g][:, None] * w[None, :]
            T = np.where(lives, test_T, T)
            last = np.where(lives, k + 1, last)
        yy, xx = np.meshgrid(ys, xs, indexing="ij")
        image[:, yy.ravel(), xx.ravel()] = Cacc
        final_T[yy.ravel(), xx.ravel()] = T
        n_contrib[yy.ravel(), xx.ravel()] = last

    image = image + final_T[None] * np.asarray(bg)[:, None, None]
    return dict(image=image, final_T=final_T, n_contrib=n_contrib, prep=prep,
                tile_ids=tile_ids, gauss=gauss)


def backward(fwd, means, scales, quats, opacities, features, affine, bg,
             width, height, dL_dimage, antialiasing=False):
    """Gradients of L = sum(dL_dimage * image) wrt every input.

    Transcribes backward renderCUDA (backward.cu:457-643: back-to-front
    rewalk from final_T with the accum_rec color recurrence and the
    background term), then computeCov2DCUDA (backward.cu:147-327, with the
    per-gaussian dL_dT computed correctly), computeCov3D backward
    (backward.cu:331-394) and the affine mean chain (backward.cu:439-445).

    Returns dict with grads for means, scales, quats, opacities, features,
    affine [3,4] (row 2 is zero: altitude only orders the sort), and
    mean2d_ndc (the viewspace-point gradient, NDC pixel-scale units, i.e.
    after the ddelx_dx = 0.5*W factor of backward.cu:630-632).
    """
    prep = fwd["prep"]
    tile_ids, gauss = fwd["tile_ids"], fwd["gauss"]
    C = features.shape[1]
    n = means.shape[0]
    gx = prep["grid"][0]
    bg = np.asarray(bg, np.float64)

    dL_dcolors = np.zeros((n, C))
    dL_dmean2d = np.zeros((n, 2))  # pixel-units * ddelx_dx (== NDC-units grad)
    dL_dconic = np.zeros((n, 3))  # (x, y, w) slots of the float4
    dL_dconw = np.zeros(n)  # grad wrt conic_opacity.w = opacity*h_scaling

    ddelx_dx = 0.5 * width
    ddely_dy = 0.5 * height

    for tile in np.unique(tile_ids):
        sel = np.nonzero(tile_ids == tile)[0]
        glist = gauss[sel]
        pxs, pys, xs, ys = _tile_pixels(tile, gx, width, height)
        npix = pxs.size
        yy, xx = np.meshgrid(ys, xs, indexing="ij")
        flat_y, flat_x = yy.ravel(), xx.ravel()
        T_final = fwd["final_T"][flat_y, flat_x]
        last_contrib = fwd["n_contrib"][flat_y, flat_x]
        dL_dpix = dL_dimage[:, flat_y, flat_x]  # [C,npix]
        bg_dot = bg @ dL_dpix  # [npix]

        T = T_final.copy()
        accum_rec = np.zeros((C, npix))
        last_alpha = np.zeros(npix)
        last_color = np.zeros((C, npix))
        for k in range(len(glist) - 1, -1, -1):
            g = glist[k]
            active = (k + 1) <= last_contrib  # contributor < last_contributor
            d_x = prep["px"][g] - pxs
            d_y = prep["py"][g] - pys
            cx, cy, cz = prep["conic"][g]
            power = -0.5 * (cx * d_x * d_x + cz * d_y * d_y) - cy * d_x * d_y
            G = np.exp(power)
            alpha = np.minimum(0.99, prep["con_w"][g] * G)
            live = active & (power <= 0.0) & (alpha >= ALPHA_MIN)
            if not live.any():
                continue
            T = np.where(live, T / (1.0 - alpha), T)
            dchannel_dcolor = alpha * T
            dL_dalpha = np.zeros(npix)
            new_accum = last_alpha * last_color + (1.0 - last_alpha) * accum_rec
            accum_rec = np.where(live[None], new_accum, accum_rec)
            c = features[g]  # [C]
            dL_dalpha = np.sum((c[:, None] - accum_rec) * dL_dpix, 0)
            dL_dcolors[g] += np.sum(np.where(live[None], dchannel_dcolor[None] * dL_dpix, 0.0), 1)
            last_color = np.where(live[None], c[:, None], last_color)
            dL_dalpha = dL_dalpha * T
            last_alpha = np.where(live, alpha, last_alpha)
            dL_dalpha = dL_dalpha + (-T_final / (1.0 - alpha)) * bg_dot
            dL_dalpha = np.where(live, dL_dalpha, 0.0)

            dL_dG = prep["con_w"][g] * dL_dalpha
            gdx = G * d_x
            gdy = G * d_y
            dG_ddelx = -gdx * cx - gdy * cy
            dG_ddely = -gdy * cz - gdx * cy
            dL_dmean2d[g, 0] += np.sum(dL_dG * dG_ddelx) * ddelx_dx
            dL_dmean2d[g, 1] += np.sum(dL_dG * dG_ddely) * ddely_dy
            dL_dconic[g, 0] += np.sum(-0.5 * gdx * d_x * dL_dG)
            dL_dconic[g, 1] += np.sum(-0.5 * gdx * d_y * dL_dG)
            dL_dconic[g, 2] += np.sum(-0.5 * gdy * d_y * dL_dG)
            dL_dconw[g] += np.sum(G * dL_dalpha)

    # ---- computeCov2DCUDA (backward.cu:147-327) ----
    cxx, cxy, cyy = prep["cxx"], prep["cxy"], prep["cyy"]
    dL_dopacity = dL_dconw.copy()
    d_inside_root = np.zeros(n)
    if antialiasing:
        h_scaling = prep["h_scaling"]
        d_h = dL_dopacity * opacities
        dL_dopacity = dL_dopacity * h_scaling
        ratio = prep["det_cov"] / prep["det"]
        d_inside_root = np.where(ratio <= 0.000025, 0.0, d_h / (2.0 * h_scaling))

    dL_dc_xx = np.zeros(n)
    dL_dc_xy = np.zeros(n)
    dL_dc_yy = np.zeros(n)
    if antialiasing:
        # d/dx [(xy - z^2)/((x+w)(y+w) - z^2)] evaluated at PRE-dilation
        # covariances (the forward's ratio argument). The reference plugs the
        # post-dilation c_xx/c_yy into this formula (backward.cu:225-237 runs
        # after the += h_var at backward.cu:205-216) — evaluating the right
        # derivative at the wrong point. Like the dL_dT indexing bug, this
        # reference defect is intentionally NOT reproduced.
        x, y, z, w = cxx - H_VAR, cyy - H_VAR, cxy, H_VAR
        denom_f = d_inside_root / (w * w + w * (x + y) + x * y - z * z) ** 2
        dL_dc_xx = w * (w * y + y * y + z * z) * denom_f
        dL_dc_yy = w * (w * x + x * x + z * z) * denom_f
        dL_dc_xy = -2.0 * w * z * (w + x + y) * denom_f

    denom = cxx * cyy - cxy * cxy
    denom2inv = 1.0 / (denom * denom + 1e-7)
    ca, cb, cc_ = dL_dconic[:, 0], dL_dconic[:, 1], dL_dconic[:, 2]
    dL_dc_xx = dL_dc_xx + denom2inv * (-cyy * cyy * ca + 2 * cxy * cyy * cb + (denom - cxx * cyy) * cc_)
    dL_dc_yy = dL_dc_yy + denom2inv * (-cxx * cxx * cc_ + 2 * cxx * cxy * cb + (denom - cxx * cyy) * ca)
    dL_dc_xy = dL_dc_xy + denom2inv * 2 * (cxy * cyy * ca - (denom + 2 * cxy * cxy) * cb + cxx * cxy * cc_)

    T = prep["T"]  # math [3,3]; glm T[a][b] = T[b,a] here
    # dL_dcov3D (upper-triangular 6-vector), backward.cu:252-268
    dL_dcov = np.zeros((n, 6))
    t00, t01 = T[0, 0], T[0, 1]  # glm T[0][0], T[1][0] are T[0,0], T[0,1]
    t10, t11 = T[1, 0], T[1, 1]
    t20, t21 = T[2, 0], T[2, 1]
    dL_dcov[:, 0] = t00 * t00 * dL_dc_xx + t00 * t01 * dL_dc_xy + t01 * t01 * dL_dc_yy
    dL_dcov[:, 3] = t10 * t10 * dL_dc_xx + t10 * t11 * dL_dc_xy + t11 * t11 * dL_dc_yy
    dL_dcov[:, 5] = t20 * t20 * dL_dc_xx + t20 * t21 * dL_dc_xy + t21 * t21 * dL_dc_yy
    dL_dcov[:, 1] = 2 * t00 * t10 * dL_dc_xx + (t00 * t11 + t10 * t01) * dL_dc_xy + 2 * t01 * t11 * dL_dc_yy
    dL_dcov[:, 2] = 2 * t00 * t20 * dL_dc_xx + (t00 * t21 + t20 * t01) * dL_dc_xy + 2 * t01 * t21 * dL_dc_yy
    dL_dcov[:, 4] = 2 * t20 * t10 * dL_dc_xx + (t10 * t21 + t20 * t11) * dL_dc_xy + 2 * t11 * t21 * dL_dc_yy
    zero_denom = denom2inv == 0.0
    dL_dcov[zero_denom] = 0.0

    # dL_dT (2x3 per gaussian, backward.cu:276-287) — CORRECT per-gaussian
    # indexing (the reference writes dL_dT[idx+k], a bug; see module doc).
    Vrk = prep["Sigma"]  # [n,3,3] symmetric
    # glm T[a][k] = T[k,a]; Vrk[a][k] = Vrk[k,a] (symmetric)
    VT = np.einsum("nij,jk->nik", Vrk, T)  # (Vrk @ T)[i,col]
    dL_dT_math = np.zeros((n, 3, 2))  # dL/dT[k, col] for col in {0,1}
    dL_dT_math[:, :, 0] = 2 * VT[:, :, 0] * dL_dc_xx[:, None] + VT[:, :, 1] * dL_dc_xy[:, None]
    dL_dT_math[:, :, 1] = 2 * VT[:, :, 1] * dL_dc_yy[:, None] + VT[:, :, 0] * dL_dc_xy[:, None]

    # ---- cov3D backward (backward.cu:331-394) ----
    R = _quat_to_R(quats)
    s = scales
    M = s[:, :, None] * R
    dL_dSigma = np.empty((n, 3, 3))
    dL_dSigma[:, 0, 0] = dL_dcov[:, 0]
    dL_dSigma[:, 0, 1] = dL_dSigma[:, 1, 0] = 0.5 * dL_dcov[:, 1]
    dL_dSigma[:, 0, 2] = dL_dSigma[:, 2, 0] = 0.5 * dL_dcov[:, 2]
    dL_dSigma[:, 1, 1] = dL_dcov[:, 3]
    dL_dSigma[:, 1, 2] = dL_dSigma[:, 2, 1] = 0.5 * dL_dcov[:, 4]
    dL_dSigma[:, 2, 2] = dL_dcov[:, 5]
    dL_dM = 2.0 * np.einsum("nij,njk->nik", M, dL_dSigma)  # glm M*dL_dSigma
    # glm: dL_dM = 2 M dL_dSigma (col-major product) == math 2 M @ dL_dSigma
    dL_dscales = np.einsum("nij,nij->ni", R, dL_dM)
    dL_dMt = dL_dM * s[:, :, None]  # dL_dMt[row i] scaled by s_i

    r, x, y, z = (quats[:, i] for i in range(4))
    # glm dL_dMt[a][b] (col a, row b) == math dL_dM[a][b] scaled by s_a == m[a,b]
    m = dL_dMt
    dL_dq = np.stack([
        2 * z * (m[:, 0, 1] - m[:, 1, 0]) + 2 * y * (m[:, 2, 0] - m[:, 0, 2]) + 2 * x * (m[:, 1, 2] - m[:, 2, 1]),
        2 * y * (m[:, 1, 0] + m[:, 0, 1]) + 2 * z * (m[:, 2, 0] + m[:, 0, 2]) + 2 * r * (m[:, 1, 2] - m[:, 2, 1]) - 4 * x * (m[:, 2, 2] + m[:, 1, 1]),
        2 * x * (m[:, 1, 0] + m[:, 0, 1]) + 2 * r * (m[:, 2, 0] - m[:, 0, 2]) + 2 * z * (m[:, 1, 2] + m[:, 2, 1]) - 4 * y * (m[:, 2, 2] + m[:, 0, 0]),
        2 * r * (m[:, 0, 1] - m[:, 1, 0]) + 2 * x * (m[:, 2, 0] + m[:, 0, 2]) + 2 * y * (m[:, 1, 2] + m[:, 2, 1]) - 4 * z * (m[:, 1, 1] + m[:, 0, 0]),
    ], 1)

    # ---- mean backward (backward.cu:439-445): dL_dmean = A_lin[:2]^T @ g2d ----
    dL_dmeans = dL_dmean2d @ affine[:2, :3]

    # ---- affine gradient (correct dL_dT chain + projection chain) ----
    dL_daffine = np.zeros((3, 4))
    p_h = np.concatenate([means, np.ones((n, 1))], 1)  # [n,4]
    dL_daffine[0] = dL_dmean2d[:, 0] @ p_h
    dL_daffine[1] = dL_dmean2d[:, 1] @ p_h
    # (dL_dmean2d already includes the 0.5*W NDC->px factor, i.e. it is the
    # gradient wrt the NDC projection u = A[0] @ p_h directly.)
    # cov2d path: T_math[k, col] = A[col, k] * N[k? ] — T_math = A_lin^T @ N2S
    # with N2S = diag(W/2, H/2, 1) applied on the RIGHT: T_math[i,j] =
    # A[j,i] * n_j where n = (W/2, H/2, 1). So dL/dA[j,i] += dL_dT_math[i,j]*n_j.
    nvec = np.array([width / 2.0, height / 2.0])
    for col in range(2):  # affine rows 0 (u) and 1 (v)
        dL_daffine[col, :3] += dL_dT_math[:, :, col].sum(0) * nvec[col]
    return dict(
        means=dL_dmeans, scales=dL_dscales, quats=dL_dq,
        opacities=dL_dopacity, features=dL_dcolors, affine=dL_daffine,
        mean2d_ndc=dL_dmean2d,
    )
