"""Pure-numpy neural net core for the EXECUTING deep-style provider
(generators/neural.py) and the J4-class MLP forecaster — the piece
that upgrades the deep-model boundary from "translation contracts,
mock-tested" to "a model that actually trains and samples in this
environment", with zero TF/torch.

Reference boundary this stands in for: the provider fit/sample calls
in `paqarin/adapters/ydata_adapter.py:291-358` (TimeGAN) and
`synthcity_adapter.py:109-155` — single-node library training on a
window population. Same placement here: training runs inside ONE
Arrow batch on a bounded, deterministically-subsampled window set;
everything before (scale, window, subsample) and after (rollout,
inverse-scale) is distributed Spark.

Determinism contract: float64 throughout, full-batch gradient steps
(no minibatch ordering), md5-derived Glorot-style init, fixed epoch
count — the trained weights are a pure function of the (sorted)
training rows, so fits are layout-independent and reproducible
across sessions. No global RNG is ever touched.
"""

from __future__ import annotations

import hashlib

import numpy as np


def _md5_unit(key: str) -> float:
    """Deterministic uniform(0,1) from an md5 prefix — the same
    construction as functions.uniform_hash, evaluated driver/worker
    side for weight init."""
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16) / float(1 << 60)


def init_params(sizes: list[int], seed: int) -> list[dict]:
    """Glorot-uniform weights from md5 draws keyed (seed, layer, i, j)
    — reproducible on any host, no RNG state."""
    layers = []
    for li in range(len(sizes) - 1):
        fan_in, fan_out = sizes[li], sizes[li + 1]
        limit = (6.0 / (fan_in + fan_out)) ** 0.5
        w = np.empty((fan_in, fan_out))
        for i in range(fan_in):
            for j in range(fan_out):
                u = _md5_unit(f"nn-init#{seed}#{li}#{i}#{j}")
                w[i, j] = (2.0 * u - 1.0) * limit
        layers.append({"w": w, "b": np.zeros(fan_out)})
    return layers


def forward(params: list[dict], x: np.ndarray) -> np.ndarray:
    """tanh hidden layers, linear output head."""
    h = x
    for layer in params[:-1]:
        h = np.tanh(h @ layer["w"] + layer["b"])
    out = params[-1]
    return h @ out["w"] + out["b"]


def train_mlp(
    x: np.ndarray,
    y: np.ndarray,
    hidden: int,
    epochs: int = 200,
    lr: float = 0.05,
    seed: int = 0,
    params: list[dict] | None = None,
) -> list[dict]:
    """Full-batch gradient descent with momentum on MSE — one hidden
    tanh layer. Full-batch (not SGD) so the gradient is an
    order-insensitive sum over rows up to float associativity, and
    the fixed epoch count keeps the fit replayable. ``params``
    continues training from an existing weight state (the local step
    of parameter-averaged training) instead of the md5 init; momentum
    restarts from zero either way."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if params is None:
        params = init_params([x.shape[1], hidden, y.shape[1]], seed)
    else:
        params = [
            {"w": np.array(p["w"], dtype=np.float64),
             "b": np.array(p["b"], dtype=np.float64)}
            for p in params
        ]
    vel = [{"w": np.zeros_like(p["w"]), "b": np.zeros_like(p["b"])} for p in params]
    n = max(len(x), 1)
    for _ in range(int(epochs)):
        h_pre = x @ params[0]["w"] + params[0]["b"]
        h = np.tanh(h_pre)
        pred = h @ params[1]["w"] + params[1]["b"]
        err = (pred - y) / n
        g1w = h.T @ err
        g1b = err.sum(0)
        dh = (err @ params[1]["w"].T) * (1.0 - h * h)
        g0w = x.T @ dh
        g0b = dh.sum(0)
        for p, v, gw, gb in (
            (params[0], vel[0], g0w, g0b),
            (params[1], vel[1], g1w, g1b),
        ):
            v["w"] = 0.9 * v["w"] - lr * gw
            v["b"] = 0.9 * v["b"] - lr * gb
            p["w"] = p["w"] + v["w"]
            p["b"] = p["b"] + v["b"]
    return params


def average_params(
    shard_params: list[tuple[int, list[dict]]],
) -> list[dict]:
    """Example-weighted average of per-shard weight states — the
    aggregation step of parameter-averaged distributed training
    (local SGD / FedAvg, McMahan et al., AISTATS 2017: each shard
    runs local full-batch steps on its own rows, the coordinator
    averages the resulting weights by shard size, rebroadcasts, and
    repeats). Shards are summed in ascending (n, weight-bytes) order —
    a CONTENT key, so the float result is independent of the order the
    executors returned them in even when two shards hold the same
    number of examples."""
    if not shard_params:
        raise ValueError("cannot average an empty shard list")

    def _content_key(t):
        n, params = t
        return (
            n,
            b"".join(
                np.ascontiguousarray(p["w"], dtype=np.float64).tobytes()
                + np.ascontiguousarray(p["b"], dtype=np.float64).tobytes()
                for p in params
            ),
        )

    ordered = sorted(shard_params, key=_content_key)
    total = float(sum(n for n, _ in ordered))
    if total <= 0:
        raise ValueError("cannot average shards with zero total examples")
    out = None
    for n, params in ordered:
        scale = n / total
        if out is None:
            out = [
                {"w": np.asarray(p["w"], dtype=np.float64) * scale,
                 "b": np.asarray(p["b"], dtype=np.float64) * scale}
                for p in params
            ]
        else:
            for acc, p in zip(out, params):
                acc["w"] = acc["w"] + np.asarray(p["w"], dtype=np.float64) * scale
                acc["b"] = acc["b"] + np.asarray(p["b"], dtype=np.float64) * scale
    return out


def mse(params: list[dict], x: np.ndarray, y: np.ndarray) -> float:
    d = forward(params, np.asarray(x, dtype=np.float64)) - np.asarray(
        y, dtype=np.float64
    )
    return float((d * d).mean())


def params_to_lists(params: list[dict]) -> list[dict]:
    """JSON-able form (persistence contract: no pickle)."""
    return [{"w": p["w"].tolist(), "b": p["b"].tolist()} for p in params]


def params_from_lists(data: list[dict]) -> list[dict]:
    return [
        {"w": np.asarray(p["w"], dtype=np.float64),
         "b": np.asarray(p["b"], dtype=np.float64)}
        for p in data
    ]


def mlp_forward_strict(
    params: list[dict], x: list, sigmoid_out: bool = False
) -> list:
    """SQL-replayable twin of :func:`forward` (and, with
    ``sigmoid_out=True``, of :func:`gan_sample`): identical
    tanh-hidden MLP math, but every dot product is a STRICT LEFT FOLD
    of scalar IEEE ops and every transcendental goes through libm
    ``math.exp`` — tanh in its exp form (e²ᵃ−1)/(e²ᵃ+1), sigmoid as
    1/(1+e⁻ᵃ) — so a DuckDB query evaluating the same expressions in
    the same association order reproduces the forward pass
    BIT-FOR-BIT (gen14/gen15's value oracles for the GAN and ARNet
    sample paths; the gru_step_strict design applied to the
    feedforward cores). ``params`` is the ``params_to_lists`` form
    (plain lists — no numpy in the contract). Association order,
    mirrored token-for-token by the oracle SQL:

        pre_k  = (fold_d x[d]·w[d][k]) + b[k]     (left fold, 0 init)
        h_k    = tanh_exp(pre_k)                   hidden layers
        out_j  = (fold_k h_k·wo[k][j]) + bo[j]     [then sigmoid]
    """
    import math

    def tanh_exp(a: float) -> float:
        e2 = math.exp(2.0 * a)
        return (e2 - 1.0) / (e2 + 1.0)

    h = [float(v) for v in x]
    for layer in params[:-1]:
        w, b = layer["w"], layer["b"]
        nxt = []
        for k in range(len(b)):
            s = 0.0
            for d in range(len(h)):
                s += h[d] * float(w[d][k])
            nxt.append(tanh_exp(s + float(b[k])))
        h = nxt
    w, b = params[-1]["w"], params[-1]["b"]
    out = []
    for j in range(len(b)):
        s = 0.0
        for k in range(len(h)):
            s += h[k] * float(w[k][j])
        a = s + float(b[j])
        out.append(1.0 / (1.0 + math.exp(-a)) if sigmoid_out else a)
    return out


# ----------------------------------------------------------------- GRU
# Recurrent core for the TimeGAN/PAR sequence-model seam
# (`paqarin/adapters/ydata_adapter.py:291-322`): a gated recurrent
# unit trained by full-batch BPTT — a model CLASS the feedforward
# ARNet/MLP heads cannot imitate (persistent hidden state across the
# whole rollout). Same determinism contract as the MLP core: float64,
# md5 Glorot init, fixed epochs, no RNG state.


def _sigmoid(a: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-a))


def init_gru_params(d_in: int, hidden: int, d_out: int, seed: int) -> dict:
    """Gate matrices packed column-wise as [z | r | c] (each
    ``hidden`` wide); md5-keyed Glorot draws, zero biases."""

    def glorot(rows, cols, tag):
        limit = (6.0 / (rows + cols)) ** 0.5
        w = np.empty((rows, cols))
        for i in range(rows):
            for j in range(cols):
                u = _md5_unit(f"gru-init#{seed}#{tag}#{i}#{j}")
                w[i, j] = (2.0 * u - 1.0) * limit
        return w

    return {
        "wx": glorot(d_in, 3 * hidden, "wx"),
        "wh": glorot(hidden, 3 * hidden, "wh"),
        "b": np.zeros(3 * hidden),
        "wo": glorot(hidden, d_out, "wo"),
        "bo": np.zeros(d_out),
    }


def gru_step(params: dict, x_t: np.ndarray, h: np.ndarray):
    """One GRU step: returns (y_t, h_new) for a batch of states.

    The input projection is computed ONCE over all three gate blocks;
    only the gate halves take the plain recurrent term, while the
    candidate's recurrent term uses the RESET-gated state (a column
    slice of a product equals the product with the sliced matrix, so
    this is bit-identical to the naive form, one matmul cheaper)."""
    hdim = params["wh"].shape[0]
    xw = x_t @ params["wx"]
    a_zr = (
        xw[:, : 2 * hdim]
        + h @ params["wh"][:, : 2 * hdim]
        + params["b"][: 2 * hdim]
    )
    z = _sigmoid(a_zr[:, :hdim])
    r = _sigmoid(a_zr[:, hdim:])
    a_c = (
        xw[:, 2 * hdim :]
        + (r * h) @ params["wh"][:, 2 * hdim :]
        + params["b"][2 * hdim :]
    )
    c = np.tanh(a_c)
    h_new = (1.0 - z) * h + z * c
    return h_new @ params["wo"] + params["bo"], h_new


def train_gru(
    seqs: np.ndarray,
    hidden: int,
    epochs: int = 150,
    lr: float = 0.05,
    seed: int = 0,
    params: dict | None = None,
) -> dict:
    """Full-batch BPTT with momentum on teacher-forced next-step MSE:
    inputs are steps 0..T-2 of every sequence, targets steps 1..T-1.
    ``seqs`` is (N, T, D) float64. Deterministic for the same reasons
    as train_mlp — order-insensitive full-batch gradients, fixed
    epochs, md5 init (or continue from ``params``)."""
    seqs = np.asarray(seqs, dtype=np.float64)
    n, t_len, d = seqs.shape
    if t_len < 2:
        raise ValueError("sequences must have at least 2 steps")
    x = seqs[:, :-1, :]
    y = seqs[:, 1:, :]
    steps = t_len - 1
    if params is None:
        params = init_gru_params(d, hidden, d, seed)
    else:
        params = {k: np.array(v, dtype=np.float64) for k, v in params.items()}
    hdim = params["wh"].shape[0]
    vel = {k: np.zeros_like(v) for k, v in params.items()}
    denom = float(n * steps * d)
    for _ in range(int(epochs)):
        # forward, caching per-step state
        h = np.zeros((n, hdim))
        cache = []
        preds = np.empty_like(y)
        for s in range(steps):
            x_t = x[:, s, :]
            xw = x_t @ params["wx"]
            a_zr = (
                xw[:, : 2 * hdim]
                + h @ params["wh"][:, : 2 * hdim]
                + params["b"][: 2 * hdim]
            )
            z = _sigmoid(a_zr[:, :hdim])
            r = _sigmoid(a_zr[:, hdim:])
            a_c = (
                xw[:, 2 * hdim :]
                + (r * h) @ params["wh"][:, 2 * hdim :]
                + params["b"][2 * hdim :]
            )
            c = np.tanh(a_c)
            h_new = (1.0 - z) * h + z * c
            preds[:, s, :] = h_new @ params["wo"] + params["bo"]
            cache.append((h, z, r, c))
            h = h_new
        grads = {k: np.zeros_like(v) for k, v in params.items()}
        dh_next = np.zeros((n, hdim))
        for s in range(steps - 1, -1, -1):
            h_prev, z, r, c = cache[s]
            h_new = (1.0 - z) * h_prev + z * c
            dy = 2.0 * (preds[:, s, :] - y[:, s, :]) / denom
            grads["wo"] += h_new.T @ dy
            grads["bo"] += dy.sum(0)
            dh = dy @ params["wo"].T + dh_next
            dz = dh * (c - h_prev)
            dc = dh * z
            dh_prev = dh * (1.0 - z)
            da_c = dc * (1.0 - c * c)
            grads["wx"][:, 2 * hdim :] += x[:, s, :].T @ da_c
            grads["wh"][:, 2 * hdim :] += (r * h_prev).T @ da_c
            grads["b"][2 * hdim :] += da_c.sum(0)
            d_rh = da_c @ params["wh"][:, 2 * hdim :].T
            dr = d_rh * h_prev
            dh_prev += d_rh * r
            da_z = dz * z * (1.0 - z)
            da_r = dr * r * (1.0 - r)
            grads["wx"][:, :hdim] += x[:, s, :].T @ da_z
            grads["wh"][:, :hdim] += h_prev.T @ da_z
            grads["b"][:hdim] += da_z.sum(0)
            grads["wx"][:, hdim : 2 * hdim] += x[:, s, :].T @ da_r
            grads["wh"][:, hdim : 2 * hdim] += h_prev.T @ da_r
            grads["b"][hdim : 2 * hdim] += da_r.sum(0)
            dh_prev += da_z @ params["wh"][:, :hdim].T
            dh_prev += da_r @ params["wh"][:, hdim : 2 * hdim].T
            dh_next = dh_prev
        for k in params:
            vel[k] = 0.9 * vel[k] - lr * grads[k]
            params[k] = params[k] + vel[k]
    return params


def gru_mse(params: dict, seqs: np.ndarray) -> float:
    """Teacher-forced next-step MSE of a fitted GRU on (N, T, D)."""
    seqs = np.asarray(seqs, dtype=np.float64)
    n, t_len, d = seqs.shape
    hdim = params["wh"].shape[0]
    h = np.zeros((n, hdim))
    err = 0.0
    for s in range(t_len - 1):
        y, h = gru_step(params, seqs[:, s, :], h)
        err += float(((y - seqs[:, s + 1, :]) ** 2).sum())
    return err / float(n * (t_len - 1) * d)


def gru_step_strict(params: dict, x: list, h: list) -> tuple[list, list]:
    """SQL-replayable twin of :func:`gru_step`: identical GRU math,
    but every reduction is a STRICT LEFT FOLD of scalar IEEE ops and
    every transcendental goes through libm ``math.exp`` — tanh is
    evaluated in its exp form (e²ᵃ−1)/(e²ᵃ+1) because DuckDB 1.0
    ships no hyperbolics — so a DuckDB recursive CTE evaluating the
    same expressions in the same association order reproduces the
    rollout BIT-FOR-BIT (gen13's value oracle for the recurrent
    sample path; DuckDB's ``exp`` is the same glibc call). The BLAS
    matmuls in :func:`gru_step` carry no such order guarantee, which
    is exactly why the executing providers' oracles need this twin.
    Numerical agreement with gru_step is pinned by tests (≤1e-9 on
    md5-derived states); the two differ only below that, in
    summation-order ulps.

    ``x`` is a length-d_in list, ``h`` a length-hidden list; returns
    (y, h_new) as plain float lists. Association order contract
    (mirrored token-for-token by the oracle SQL):

        xw_k    = fold_d  x[d]·wx[d][k]            (left fold, 0 init)
        pre_k   = (xw_k + fold_i h[i]·wh[i][k]) + b[k]
        cand_k  = (xw_k + fold_i (r[i]·h[i])·wh[i][k]) + b[k]
        h'_k    = ((1−z_k)·h_k) + (z_k·c_k)
        y_j     = (fold_i h'_i·wo[i][j]) + bo[j]
    """
    import math

    wx, wh, b = params["wx"], params["wh"], params["b"]
    wo, bo = params["wo"], params["bo"]
    hdim = len(h)
    d_in = len(x)
    xw = []
    for k in range(3 * hdim):
        s = 0.0
        for d in range(d_in):
            s += float(x[d]) * float(wx[d][k])
        xw.append(s)

    def fold(vec, col):
        s = 0.0
        for i in range(hdim):
            s += vec[i] * float(wh[i][col])
        return s

    z = [
        1.0 / (1.0 + math.exp(-((xw[k] + fold(h, k)) + float(b[k]))))
        for k in range(hdim)
    ]
    r = [
        1.0
        / (
            1.0
            + math.exp(
                -((xw[hdim + k] + fold(h, hdim + k)) + float(b[hdim + k]))
            )
        )
        for k in range(hdim)
    ]
    rh = [r[i] * float(h[i]) for i in range(hdim)]
    def tanh_exp(a: float) -> float:
        e2 = math.exp(2.0 * a)
        return (e2 - 1.0) / (e2 + 1.0)

    c = [
        tanh_exp(
            (xw[2 * hdim + k] + fold(rh, 2 * hdim + k))
            + float(b[2 * hdim + k])
        )
        for k in range(hdim)
    ]
    h_new = [
        ((1.0 - z[k]) * float(h[k])) + (z[k] * c[k]) for k in range(hdim)
    ]
    y = []
    for j in range(len(bo)):
        s = 0.0
        for i in range(hdim):
            s += h_new[i] * float(wo[i][j])
        y.append(s + float(bo[j]))
    return y, h_new


def gru_params_to_lists(params: dict) -> dict:
    return {k: np.asarray(v, dtype=np.float64).tolist() for k, v in params.items()}


def gru_params_from_lists(data: dict) -> dict:
    return {k: np.asarray(v, dtype=np.float64) for k, v in data.items()}


# ----------------------------------------------------------------- GAN
# Adversarial core for the TimeGAN generator/discriminator seam
# (`paqarin/adapters/ydata_adapter.py:291-322`): a generator and a
# discriminator trained JOINTLY by alternating full-batch steps — the
# one model class every other executing provider (regression-fit
# ARNet/GRU, closed-form copula/bootstrap) cannot occupy, because its
# objective is a two-player game, not a loss against paired targets.
# Same determinism contract as the other cores: float64, md5 Glorot
# init, md5-derived noise keyed (seed, epoch, i, j), fixed epochs,
# plain gradient descent (NO momentum — momentum on a full-batch
# minimax oscillator is what made the first prototypes diverge),
# one-sided label smoothing (real target 0.9, Salimans et al. 2016)
# to keep the discriminator from saturating the game.


def gan_noise(n: int, nz: int, seed: int, tag: str) -> np.ndarray:
    """(n, nz) uniform(-1,1) noise from md5 draws keyed
    (tag, seed, row, col) — replayable on any host, no RNG state."""
    return np.array(
        [
            [
                2.0 * _md5_unit(f"gan-{tag}#{seed}#{i}#{j}") - 1.0
                for j in range(nz)
            ]
            for i in range(n)
        ],
        dtype=np.float64,
    )


def gan_sample(g_params: list[dict], z: np.ndarray) -> np.ndarray:
    """Generator forward pass: tanh hidden, SIGMOID output — samples
    live in (0,1), the min-max-scaled domain, so the generator can
    neither explode nor need clipping."""
    hg = np.tanh(z @ g_params[0]["w"] + g_params[0]["b"])
    return _sigmoid(hg @ g_params[1]["w"] + g_params[1]["b"])


def train_gan(
    real: np.ndarray,
    nz: int = 3,
    hidden_g: int = 16,
    hidden_d: int = 8,
    epochs: int = 1500,
    lr_g: float = 1.0,
    lr_d: float = 0.5,
    seed: int = 0,
    smooth: float = 0.9,
) -> tuple[list[dict], list[dict], list[float]]:
    """Non-saturating GAN (Goodfellow et al. 2014) on (N, D) rows in
    [0,1]: per epoch, ONE full-batch discriminator step on
    −mean log σ(D(x)) − mean log(1−σ(D(G(z)))) with the real target
    smoothed to ``smooth``, then ONE generator step on the
    non-saturating −mean log σ(D(G(z))) against the UPDATED
    discriminator, fresh md5 noise every epoch. Returns
    (g_params, d_params, per-epoch discriminator losses) — the loss
    trace is what the tests pin (descends from the init value but
    stays OFF zero: a discriminator loss at 0 means the game
    collapsed, which is exactly what the no-momentum/smoothing
    choices prevent)."""
    real = np.asarray(real, dtype=np.float64)
    n, d = real.shape
    if n == 0:
        raise ValueError("cannot train a GAN on zero rows")
    if int(epochs) < 1:
        raise ValueError(f"epochs must be >= 1, got {epochs}")
    g = init_params([nz, hidden_g, d], seed)
    dis = init_params([d, hidden_d, 1], seed + 1)
    losses: list[float] = []
    for ep in range(int(epochs)):
        z = gan_noise(n, nz, seed, f"z#{ep}")
        hg = np.tanh(z @ g[0]["w"] + g[0]["b"])
        xg = _sigmoid(hg @ g[1]["w"] + g[1]["b"])
        # --- discriminator step (real + fake halves, fake detached)
        hr = np.tanh(real @ dis[0]["w"] + dis[0]["b"])
        pr = _sigmoid(hr @ dis[1]["w"] + dis[1]["b"])
        hf = np.tanh(xg @ dis[0]["w"] + dis[0]["b"])
        pf = _sigmoid(hf @ dis[1]["w"] + dis[1]["b"])
        losses.append(
            float(
                -(np.log(np.maximum(pr, 1e-12))).mean()
                - (np.log(np.maximum(1.0 - pf, 1e-12))).mean()
            )
        )
        dlr = (pr - smooth) / n
        dlf = pf / n
        g1w = hr.T @ dlr + hf.T @ dlf
        g1b = dlr.sum(0) + dlf.sum(0)
        dhr = (dlr @ dis[1]["w"].T) * (1.0 - hr * hr)
        dhf = (dlf @ dis[1]["w"].T) * (1.0 - hf * hf)
        g0w = real.T @ dhr + xg.T @ dhf
        g0b = dhr.sum(0) + dhf.sum(0)
        dis[0]["w"] = dis[0]["w"] - lr_d * g0w
        dis[0]["b"] = dis[0]["b"] - lr_d * g0b
        dis[1]["w"] = dis[1]["w"] - lr_d * g1w
        dis[1]["b"] = dis[1]["b"] - lr_d * g1b
        # --- generator step against the updated discriminator
        # (hg/xg are unchanged since the epoch's forward pass — only
        # the discriminator moved — so reuse them; recomputing was
        # two wasted full-batch matmuls per epoch)
        hf = np.tanh(xg @ dis[0]["w"] + dis[0]["b"])
        pf = _sigmoid(hf @ dis[1]["w"] + dis[1]["b"])
        dlf = (pf - 1.0) / n
        dxg = ((dlf @ dis[1]["w"].T) * (1.0 - hf * hf)) @ dis[0]["w"].T
        dpre = dxg * xg * (1.0 - xg)
        gg1w = hg.T @ dpre
        gg1b = dpre.sum(0)
        dhg = (dpre @ g[1]["w"].T) * (1.0 - hg * hg)
        gg0w = z.T @ dhg
        gg0b = dhg.sum(0)
        g[0]["w"] = g[0]["w"] - lr_g * gg0w
        g[0]["b"] = g[0]["b"] - lr_g * gg0b
        g[1]["w"] = g[1]["w"] - lr_g * gg1w
        g[1]["b"] = g[1]["b"] - lr_g * gg1b
    return g, dis, losses
