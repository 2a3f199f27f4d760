import sys, time, json
import jax, jax.numpy as jnp, numpy as np
from mtgs_tpu.data.synthetic import batch_iterator, build_scene_model, make_synthetic_scene
from mtgs_tpu.train import control as ctrl
from mtgs_tpu.train import losses as loss_lib
from mtgs_tpu.train.trainer import Trainer, TrainerConfig

t0=time.perf_counter()
scene = make_synthetic_scene(seed=0, width=480, height=270, n_travels=2, n_frames=3,
    n_bg=200000, n_instance=5000, extent=60.0, backend="auto", n_seed=200000)
params, aux = build_scene_model(scene, with_instances=True, with_skybox=True, skybox_points=100000)
cfg = TrainerConfig(width=480, height=270, max_intersections=524288,
    rasterize_mode="antialiased", backend="auto", fused=True, predict_normals=True,
    control=ctrl.ControlConfig(),
    loss=loss_lib.LossConfig(ssim_lambda=0.2, depth_lambda=0.5, ncc_lambda=0.1,
        normal_lambda=0.1, use_normal_loss=True, use_normal_tv_loss=True))
trainer = Trainer(cfg, params, aux, batch_iterator(scene))
it = trainer.data
b = next(it)
print(f"# setup {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)
t0=time.perf_counter()
trainer.state, m = trainer._step_fn(trainer.state, trainer.aux, b)
jax.block_until_ready(m)
print(f"# first step {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)
N = 5
with jax.profiler.trace("/tmp/step_trace"):
    for _ in range(N):
        trainer.state, m = trainer._step_fn(trainer.state, trainer.aux, b)
    jax.block_until_ready(m)
from mtgs_tpu.utils.observability import summarize_trace
for ms, cnt, name in summarize_trace("/tmp/step_trace", top=30, iters=N):
    print(f"{ms:9.2f} ms x{cnt:4d}  {name}")
