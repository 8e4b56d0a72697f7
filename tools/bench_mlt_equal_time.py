"""Equal-time PSSMLT vs PT on the slit scene (verdict r3 stretch #9).

The classic Metropolis win: scenes/mlt_slit lights the room ONLY
through a small hole in a divider — PT/NEE shadow rays are almost
always occluded, so its estimator variance explodes; PSSMLT chains
lock onto hole-transmitting paths. Protocol:

1. converge a PT reference (REF_SPP samples — unbiased, so both
   candidates converge to it);
2. render the scene with PT for BUDGET seconds, then MLT for BUDGET
   seconds (fresh Renderer each, same process);
3. report tonemapped-RMSE of each against the reference as one JSON
   line.

    python tools/bench_mlt_equal_time.py [size] [budget_s] [ref_spp]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gpu_pathtracer_tpu.run.renderer import Renderer, enable_compile_cache
enable_compile_cache()
from gpu_pathtracer_tpu.scene.parse import load_scene
from gpu_pathtracer_tpu.scene.model import IntegratorType

SCENE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scenes/mlt_slit/scene.json")


def render_budget(host, integrator, budget_s):
    r = Renderer(host, integrator=integrator)
    r.render(1)            # compile + warm (excluded, like bench.py)
    t0 = time.time()
    spp = 0
    while time.time() - t0 < budget_s:
        r.render(4)
        spp += 4
    dt = time.time() - t0
    return r, spp, dt


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 60.0
    ref_spp = int(sys.argv[3]) if len(sys.argv) > 3 else 16384

    host = load_scene(SCENE)
    host.width = host.height = size

    rref = Renderer(host, integrator=IntegratorType.PT)
    t0 = time.time()
    rref.render(ref_spp)
    print(f"# reference PT {ref_spp} spp in {time.time() - t0:.0f}s",
          flush=True)
    ref = np.asarray(rref.image())

    out = {"scene": "mlt_slit", "size": size, "budget_s": budget,
           "ref_spp": ref_spp}
    for name, integ in (("pt", IntegratorType.PT),
                        ("mlt", IntegratorType.MLT)):
        r, spp, dt = render_budget(host, integ, budget)
        img = np.asarray(r.image())
        rmse = float(np.sqrt(np.mean((img - ref) ** 2)))
        out[f"{name}_spp"] = spp
        out[f"{name}_rmse"] = round(rmse, 5)
        print(f"# {name}: {spp} spp in {dt:.1f}s -> RMSE {rmse:.5f}",
              flush=True)
    out["mlt_vs_pt"] = round(out["pt_rmse"] / max(out["mlt_rmse"], 1e-9), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
