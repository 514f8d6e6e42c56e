"""Learning sanity: tiny bi-TAI must learn to interpolate a moving square.

End-to-end optimization check of the full L2+GDL+SN-GAN pipeline (observed:
PSNR 6 -> 21 dB over 300 iters; we assert a +5 dB gain in 150)."""

import jax
import jax.numpy as jnp
import numpy as np

from vfi_tpu.models.fill_in import TAIFillInModel
from vfi_tpu.train.environments import create_training_environment
from vfi_tpu.utils.config import TrainConfig

H = W = 32
K = T = F = 2
B = 8


def _moving_square_batch(rs):
    vids = []
    for _ in range(B):
        x0, y0 = rs.randint(2, 10), rs.randint(2, 10)
        dx, dy = rs.randint(1, 4), rs.randint(1, 4)
        frames = []
        for t in range(K + T + F):
            img = -np.ones((H, W, 1), np.float32)
            x, y = x0 + dx * t, y0 + dy * t
            img[y : y + 8, x : x + 8] = 1.0
            frames.append(img)
        vids.append(np.stack(frames))
    return np.stack(vids)


def test_tai_learns_moving_square():
    rs = np.random.RandomState(0)
    model = TAIFillInModel(gf_dim=8, c_dim=1, ks=5, num_block=5, kf_dim=8)
    cfg = TrainConfig(K=K, T=T, F=F, df_dim=8, Ip=1, disc_window_size=3, beta=0.001, lr=3e-4)
    env = create_training_environment(model, cfg)
    state = env.init_state(jax.random.PRNGKey(0), _moving_square_batch(rs), K, T, F)

    def val_psnr(state):
        batch = jnp.asarray(_moving_square_batch(np.random.RandomState(999)))
        m = env.eval_metrics(state.g_params, K, T, F, batch)
        return float(np.mean(np.asarray(m["psnr"])))

    p0 = val_psnr(state)
    for _ in range(150):
        state, m = env.train_step(state, K, T, F, _moving_square_batch(rs))
    p1 = val_psnr(state)
    assert np.isfinite(float(m["G_loss"]))
    assert p1 > p0 + 5.0, f"no learning: psnr {p0:.2f} -> {p1:.2f}"
