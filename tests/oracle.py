"""Independent NumPy oracle decoder for golden tests.

Deliberately structured nothing like the framework: it walks the *dense*
lifted parity-check matrix H edge by edge with Python loops and dictionaries,
so it shares no index-map code with `ldpc_error_floor_tpu.codes.graph`.
Semantics follow the behavioral spec in SURVEY.md sections 2.3-2.5 (zero-message
epsilon nudges, masked-magnitude sentinel, sign recursion, clipping and QMS
quantization points, UCN detection, weight sharing modes).

Everything is float32 to match the framework's arithmetic.
"""

from __future__ import annotations

import numpy as np

F = np.float32


def quantize(x, q_bit):
    grids = {6: (1.0, 15.5), 5: (0.5, 7.5), -5: (1.0, 15.0), 4: (1.0, 7.0),
             3: (2.0, 6.0)}
    step, clip = grids[q_bit]
    return np.clip(np.round(np.asarray(x, F) / F(step)) * F(step), -clip, clip).astype(F)


def oracle_decode(proto, z, llr, n_iters, sharing, weights, *,
                  decoding_type=2, q_bit=5, clip_llr=20.0, fixed_iter=0):
    """Decode one batch of frames; returns per-iteration APPs [T, N*z, B].

    proto: [M, N] with -1 = no edge, >=0 = shift.
    llr: [N*z, B] p1/p0 channel LLRs.
    weights: dict kind -> [rows, dim] numpy array or None (rows as stored:
        n_iters rows for per-iteration modes, fixed_iter+1 for temporal).
    """
    proto = np.asarray(proto)
    m, n = proto.shape
    llr = np.asarray(llr, F)
    nz, batch = llr.shape
    assert nz == n * z

    # dense lifted H and edge list
    edges = []  # (check row r, bit col c)
    for i in range(m):
        for j in range(n):
            s = proto[i, j]
            if s >= 0:
                for h in range(z):
                    edges.append((i * z + h, j * z + (h + int(s)) % z))
    check_nbrs = {}  # r -> [c...]
    bit_nbrs = {}    # c -> [r...]
    for r, c in edges:
        check_nbrs.setdefault(r, []).append(c)
        bit_nbrs.setdefault(c, []).append(r)

    # row-major proto edge index, for per-edge (CN-order) weights
    proto_edge_idx = {}
    k = 0
    for i in range(m):
        for j in range(n):
            if proto[i, j] >= 0:
                proto_edge_idx[(i, j)] = k
                k += 1

    def w_row(kind, t):
        arr = weights.get(kind)
        mode = sharing[{"cn": 0, "ucn": 1, "vn": 2}[kind]]
        if mode == 0 or arr is None:
            return None
        row = min(t, fixed_iter) if mode in (4, 5) else t
        return np.asarray(arr[row], F)

    def cn_weight(kind, t, r, c):
        row = w_row(kind, t)
        mode = sharing[{"cn": 0, "ucn": 1}[kind]]
        i, j = r // z, c // z
        if mode in (1, 4):
            return row[proto_edge_idx[(i, j)]]
        if mode in (2, 5):
            return row[i]
        return row[0]

    c2v = {e: F(0.0) for e in edges}
    apps = np.zeros((n_iters, nz, batch), F)
    prev_app = None

    for t in range(n_iters):
        # weighted channel input
        vrow = w_row("vn", t)
        vmode = sharing[2]
        if vmode in (2, 5):
            llr_w = llr * vrow[np.repeat(np.arange(n), z)][:, None]
        elif vmode == 3:
            llr_w = llr * vrow[0]
        else:
            llr_w = llr.copy()
        if decoding_type == 2:
            llr_w = quantize(llr_w, q_bit)

        # UCN flags per lifted check
        if sharing[1] > 0:
            src = llr_w if t == 0 else prev_app
            bits = (src >= 0).astype(np.int64)
            ucn = {r: (sum(bits[c] for c in check_nbrs[r]) % 2).astype(bool)
                   for r in check_nbrs}

        # VN update
        v2c = {}
        for (r, c) in edges:
            s = sum((c2v[(r2, c)] for r2 in bit_nbrs[c] if r2 != r),
                    np.zeros(batch, F))
            v = llr_w[c] + s
            if decoding_type == 2:
                v = quantize(v, q_bit)
            else:
                v = np.clip(v, -clip_llr, clip_llr).astype(F)
            if decoding_type in (1, 2):
                v = np.where(v == 0, F(1e-4), v)
            v2c[(r, c)] = v

        # CN update + weighting
        new_c2v = {}
        for (r, c) in edges:
            others = [v2c[(r, c2)] for c2 in check_nbrs[r] if c2 != c]
            if decoding_type == 0:
                tt = [np.tanh(F(-0.5) * v) for v in others]
                tt = [np.where(v == 0, F(1.0), v) for v in tt]
                p = np.ones(batch, F)
                for v in tt:
                    p = p * v
                p = np.clip(p, -1 + 1e-7, 1 - 1e-7).astype(F)
                out = F(-2.0) * np.arctanh(p).astype(F)
            else:
                mags = [np.where(v == 0, F(1e4), np.abs(v)) for v in others]
                sgns = [np.where(v > 0, F(-1.0), F(1.0)) for v in others]
                mag = np.full(batch, F(1e4))
                for v in mags:
                    mag = np.minimum(mag, v)
                mag = np.where(np.abs(mag) <= F(1e-4), mag - F(1e-4), mag)
                sp = np.ones(batch, F)
                for v in sgns:
                    sp = sp * v
                out = mag * (-sp)
            amag = np.abs(out)
            if sharing[0] > 0:
                w_s = cn_weight("cn", t, r, c) * np.ones(batch, F)
                if sharing[1] > 0:
                    w_u = cn_weight("ucn", t, r, c) * np.ones(batch, F)
                    w = np.where(ucn[r], w_u, w_s)
                else:
                    w = w_s
                amag = amag * w
            amag = amag * (amag > 0)
            if decoding_type == 2:
                amag = quantize(amag, q_bit)
            else:
                amag = np.clip(amag, -clip_llr, clip_llr).astype(F)
            new_c2v[(r, c)] = amag * np.sign(out)
        c2v = new_c2v

        # APP
        llr_app = quantize(llr, q_bit) if decoding_type == 2 else llr
        app = llr_app.copy()
        for (r, c) in edges:
            app[c] = app[c] + c2v[(r, c)]
        app = np.clip(app, -clip_llr, clip_llr).astype(F)
        apps[t] = app
        prev_app = app

    return apps
