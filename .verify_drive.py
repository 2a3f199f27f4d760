"""Verify drive: render + optimize a synthetic scene through the public API (CPU)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jaxcache"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
import jax.numpy as jnp
import numpy as np
import optax
from mtgs_tpu.raster import rasterize, RasterizeConfig

rng = np.random.default_rng(3)
N, H, W = 400, 128, 128
means = jnp.asarray(
    np.concatenate(
        [rng.uniform(-2.5, 2.5, (N, 2)), rng.uniform(4, 9, (N, 1))], axis=1
    ),
    jnp.float32,
)
quats = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)
scales = jnp.asarray(rng.uniform(0.08, 0.35, (N, 3)), jnp.float32)
opac = jnp.full((N,), 0.8, jnp.float32)
colors = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
viewmat = jnp.eye(4, dtype=jnp.float32)
K = jnp.array([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]], jnp.float32)
cfg = RasterizeConfig(width=W, height=H, max_intersections=1 << 15)

im, alpha, _ = jax.jit(
    lambda *a: rasterize(*a, cfg)
)(means, quats, scales, opac, colors, viewmat, K)
im = np.asarray(im)
print("render: min %.3f max %.3f mean %.3f  alpha mean %.3f" %
      (im.min(), im.max(), im.mean(), float(alpha.mean())))
assert im.max() > 0.3 and 0.05 < float(alpha.mean()) < 1.0
from PIL import Image
Image.fromarray((np.clip(im, 0, 1) * 255).astype(np.uint8)).save("/tmp/verify_render.png")

# depth probe
cfg_d = RasterizeConfig(width=W, height=H, max_intersections=1 << 15,
                        render_mode="RGB+ED")
imd, _, _ = jax.jit(lambda *a: rasterize(*a, cfg_d))(
    means, quats, scales, opac, colors, viewmat, K)
d = np.asarray(imd[..., 3])
dv = d[np.asarray(alpha).reshape(H, W) > 0.5]
print("depth: median %.2f (gaussians at z 4..9)" % np.median(dv))
assert 3.0 < np.median(dv) < 10.0

# zero-opacity probe
im0, a0, _ = jax.jit(lambda *a: rasterize(*a, cfg))(
    means, quats, scales, jnp.zeros_like(opac), colors, viewmat, K)
assert float(jnp.abs(im0).max()) == 0.0 and float(a0.max()) == 0.0
print("zero-opacity probe: exact zeros OK")

# color fit
target = jnp.zeros((H, W, 3)).at[:, : W // 2, 0].set(1.0).at[:, W // 2:, 2].set(1.0)

def loss_fn(c):
    r, _, _ = rasterize(means, quats, scales, opac, c, viewmat, K, cfg)
    return jnp.abs(r - target).mean()

opt = optax.adam(0.05)
st = opt.init(colors)
vg = jax.jit(jax.value_and_grad(loss_fn))
c = colors
l0 = None
for i in range(40):
    l, g = vg(c)
    if l0 is None:
        l0 = float(l)
    u, st = opt.update(g, st)
    c = optax.apply_updates(c, u)
lf = float(loss_fn(c))
print("fit: loss %.4f -> %.4f (%.1fx)" % (l0, lf, l0 / lf))
assert l0 / lf > 3.0
r, _, _ = jax.jit(lambda cc: rasterize(means, quats, scales, opac, cc, viewmat, K, cfg))(c)
Image.fromarray((np.clip(np.asarray(r), 0, 1) * 255).astype(np.uint8)).save("/tmp/verify_fit.png")
print("VERIFY PASS")
