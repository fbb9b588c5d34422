"""IMU denoising network (Conv1d tokenizer -> GRU -> MLP correction).

TPU-native rebuild of ``IMUCorrector_CNN_GRU_WO_COV``
(Network/IMUDenoiseNet.py:9-62): Conv1d(6->64, k=10, s=10) + GELU, GRU(64->128),
MLP 128->64->6 with GELU after each layer (including the last, as the
reference does at IMUDenoiseNet.py:21-26), then the 6-channel correction is
repeated back to sample rate and ADDED to (acc, gyro).

Implemented as pure functions over a parameter pytree (packed GRU weights in
torch layout so reference checkpoints import directly), with a fixed padded
sample length so the whole thing lives inside jit: sample k takes the
correction of token min(k // 10, T_valid - 1), which reproduces the
reference's repeat_interleave pattern (IMUDenoiseNet.py:48-51) exactly for
any true window length while keeping shapes static.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

TOKEN = 10  # conv kernel == stride == 10 samples per token


def init_params(key: jax.Array, in_channel: int = 6, out_channel: int = 64,
                hidden: int = 128) -> Dict[str, Any]:
    k = jax.random.split(key, 8)
    u = lambda kk, shape, fan: jax.random.uniform(
        kk, shape, jnp.float32, -1.0, 1.0) / jnp.sqrt(fan)
    return {
        # torch Conv1d weight layout: (out, in, k)
        "conv1": {"weight": u(k[0], (out_channel, in_channel, TOKEN), in_channel * TOKEN),
                  "bias": u(k[1], (out_channel,), in_channel * TOKEN)},
        # torch GRU packed layout: rows ordered (reset, update, new)
        "gru": {"weight_ih_l0": u(k[2], (3 * hidden, out_channel), hidden),
                "weight_hh_l0": u(k[3], (3 * hidden, hidden), hidden),
                "bias_ih_l0": u(k[4], (3 * hidden,), hidden),
                "bias_hh_l0": u(k[5], (3 * hidden,), hidden)},
        "decoder": {
            "0": {"weight": u(k[6], (64, hidden), hidden), "bias": jnp.zeros(64)},
            "2": {"weight": u(k[7], (6, 64), 64), "bias": jnp.zeros(6)},
        },
    }


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)  # torch nn.GELU default (erf)


def _gru_scan(params: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    """x: (T, C_in) -> hidden states (T, H). Torch GRU gate math."""
    hidden = params["weight_hh_l0"].shape[1]
    w_ih = params["weight_ih_l0"].T  # (C_in, 3H)
    w_hh = params["weight_hh_l0"].T  # (H, 3H)
    b_ih = params["bias_ih_l0"]
    b_hh = params["bias_hh_l0"]

    # Precompute input projections for the whole sequence (one big matmul).
    xi = x @ w_ih + b_ih  # (T, 3H)

    def step(h, xi_t):
        hh = h @ w_hh + b_hh
        r = jax.nn.sigmoid(xi_t[:hidden] + hh[:hidden])
        z = jax.nn.sigmoid(xi_t[hidden:2 * hidden] + hh[hidden:2 * hidden])
        n = jnp.tanh(xi_t[2 * hidden:] + r * hh[2 * hidden:])
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros((hidden,), dtype=x.dtype)
    _, hs = jax.lax.scan(step, h0, xi)
    return hs


def denoise(params: Dict[str, Any], acc: jax.Array, gyro: jax.Array,
            n_valid: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Correct (S, 3) acc/gyro given the true sample count ``n_valid``.

    Samples at index >= n_valid must be zero on input; their outputs are
    unspecified (masked downstream).  Applies no correction when
    n_valid < 10, mirroring imu_integrator.py:107.
    """
    S = acc.shape[0]
    x = jnp.concatenate([acc, gyro], axis=-1)  # (S, 6)

    # Conv1d(k=10, s=10, VALID): token t = W . x[10t:10t+10] + b
    T = S // TOKEN
    xt = x[: T * TOKEN].reshape(T, TOKEN, 6)
    w = params["conv1"]["weight"]  # (64, 6, 10)
    tok = jnp.einsum("tkc,ock->to", xt, w) + params["conv1"]["bias"]
    tok = _gelu(tok)

    hs = _gru_scan(params["gru"], tok)  # (T, 128)

    d = params["decoder"]
    out = _gelu(hs @ d["0"]["weight"].T + d["0"]["bias"])
    out = _gelu(out @ d["2"]["weight"].T + d["2"]["bias"])  # (T, 6)

    # Token assignment: sample k -> token min(k // 10, T_valid - 1), where
    # T_valid = floor(n_valid / 10) (torch conv output length for k=s=10).
    t_valid = jnp.maximum(n_valid // TOKEN, 1)
    sample_tok = jnp.minimum(jnp.arange(S) // TOKEN, t_valid - 1)
    corr = out[sample_tok]  # (S, 6)

    apply = (n_valid >= TOKEN)
    corr = jnp.where(apply, corr, 0.0)
    return acc + corr[:, :3], gyro + corr[:, 3:]


def denoise_and_integrate(params, acc, gyro, dts, init, gravity,
                          n_valid=None):
    """Supervised-training variant (``IMUCorrector_CNN_GRU``,
    Network/IMUDenoiseNet.py:64-110): denoise then preintegrate the
    corrected stream, returning per-sample world states for direct pose
    supervision of the denoiser."""
    from islam_tpu.imu.preintegrator import preintegrate

    if n_valid is None:
        n_valid = jnp.asarray(acc.shape[0])
    d_acc, d_gyro = denoise(params, acc, gyro, n_valid)
    valid = jnp.arange(acc.shape[0]) < n_valid
    return preintegrate(dts, d_gyro, d_acc, init, gravity, valid=valid)
