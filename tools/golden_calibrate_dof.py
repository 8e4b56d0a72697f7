import os
import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
os.environ['JAX_PLATFORMS']='cpu'
import jax; jax.config.update('jax_platforms','cpu')
import numpy as np
from gpu_pathtracer_tpu.scene.parse import load_scene
from gpu_pathtracer_tpu.run.renderer import Renderer
from gpu_pathtracer_tpu.run.golden import GOLDENS, _load_png, _downsample
from gpu_pathtracer_tpu.film.imageio import save_png

g = _downsample(_load_png(GOLDENS['cornell_dof']['golden']), 128)
for filmic in (True,):
    for ap in (0.1, 0.2, 0.3):
        for fd in (6.5, 7.0):
            host = load_scene('/root/repo/scenes/cornell_dof/scene.json')
            host.width = host.height = 128
            host.camera.filmic = filmic
            host.camera.apertureRadius = ap
            host.camera.focalDistance = fd
            r = Renderer(host, max_depth=8)
            r.render(16)
            img = r.image()[::-1]
            rmse = float(np.sqrt(((img - g) ** 2).mean()))
            print(f"filmic={filmic} ap={ap} fd={fd}: RMSE {rmse:.4f}", flush=True)
            save_png(f"/tmp/dof_f{int(filmic)}_a{ap}_d{fd}.png", img[::-1])
