import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp, json, dataclasses as dc
from pathlib import Path
from mtgs_tpu.data.synthetic import SyntheticScene, build_scene_model
from mtgs_tpu.configs import method_config
from mtgs_tpu.train.checkpoint import pad_scene_to_caps, load_checkpoint
from mtgs_tpu.train.trainer import render_view
from mtgs_tpu.tools.campaign import make_batch

out = Path("results/onchip/campaign_r4b")
z = np.load(out / "scene_cache.npz")
scene = SyntheticScene(**{f.name: (z[f.name] if f.name in z.files else int(z[f"_{f.name}"]))
                          for f in dc.fields(SyntheticScene)})
meta = json.loads((out / "resume_meta.json").read_text())
params, aux = build_scene_model(scene, with_instances=True, with_skybox=True, skybox_points=100000)
params, aux = pad_scene_to_caps(params, aux, meta["caps"])
from mtgs_tpu.train.trainer import _make_densify
tmpl = {"params": params, "aux": aux, "step": jnp.zeros((), jnp.int32),
        "densify": _make_densify(params)}
restored = load_checkpoint(out / "final-step-000010001", tmpl)
params, aux = restored["params"], restored["aux"]

cfg = method_config("mtgs", width=960, height=540, max_steps=10001)
cfg = cfg.replace(backend="xla", fused=False, max_intersections=1<<19,
                  width=240, height=136)
step = jnp.asarray(10**9, jnp.int32)

print("alive: bg", int(np.asarray(aux.background.num_alive)),
      "sky", int(np.asarray(aux.skybox.num_alive)) if aux.skybox is not None else None)
op = np.asarray(jax.nn.sigmoid(params.background.opacities[:, 0]))
al = np.asarray(aux.background.alive) > 0
print("bg alive opacities: mean", op[al].mean().round(3), "p50", np.median(op[al]).round(3))

for t in range(3):
    for f in [1, 2]:
        b = make_batch(scene, t, f, 0.25)
        b = b.replace(K=b.K.at[:2].mul(240/240), image=b.image)  # scale already applied
        o = render_view(params, aux, cfg, b, step, training=False,
                        travel_mode="index" if t < 2 else "mean")
        pred = np.asarray(o["rgb_appearance"]); gtq = np.asarray(b.image)
        h = min(pred.shape[0], gtq.shape[0]); w = min(pred.shape[1], gtq.shape[1])
        mse = ((pred[:h,:w]-gtq[:h,:w])**2).mean()
        print(f"trv{t} f{f}: psnr {(-10*np.log10(max(mse,1e-10))):.2f} "
              f"n_isect {int(np.asarray(o['n_intersections']))} "
              f"alpha_mean {float(np.asarray(o['accumulation']).mean()):.3f} "
              f"pred_mean {pred.mean(axis=(0,1)).round(3)} gt_mean {gtq.mean(axis=(0,1)).round(3)}")
