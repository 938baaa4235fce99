"""Training sanity: overfit one synthetic batch; the total cost must drop.

Evidence that the glimpse-decoder training math (REINFORCE + pyramid
losses + BN/baseline state threading + adadelta chain) optimises.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

import time
import numpy as np
import jax, jax.numpy as jnp

from tpuseg.cli.common import build_model, init_variables
from tpuseg.configs import cvppp_config
from tpuseg.data.dataset import AlignCollate
from tpuseg.data.synthetic import make_scene
from tpuseg.runtime import create_train_state, make_train_step

def main(steps=40):
    cfg = cvppp_config()
    model = build_model(cfg)
    variables = init_variables(cfg, model, seed=cfg.train.seed)
    state = create_train_state(cfg, variables)
    rng = np.random.default_rng(3)
    scenes = [make_scene(rng, 256, 256, min_leaves=4, max_leaves=8) for _ in range(2)]
    collate = AlignCollate("test", cfg.data, 2)
    from PIL import Image
    samples = [(Image.fromarray(s[0]), s[1], s[2], s[3]) for s in scenes]
    batch = {k: jnp.asarray(v) for k, v in collate(samples).asdict().items()}
    step = make_train_step(cfg, model)
    key = jax.random.PRNGKey(cfg.train.seed)
    costs = []
    t0 = time.time()
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
        c = float(m["cost"])  # forces sync
        costs.append(c)
        if i % 5 == 0 or i == steps - 1:
            print(f"step {i}: cost={c:.4f} ins={float(m['ins_cost']):.4f} "
                  f"ce={float(m['ce_cost']):.4f} dice={float(m['dice_cost']):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    first = np.mean(costs[:5]); last = np.mean(costs[-5:])
    print(f"mean first-5 cost {first:.3f} -> mean last-5 cost {last:.3f}", flush=True)
    assert last < first, "training cost did not decrease"
    print("OVERFIT CHECK PASSED", flush=True)

if __name__ == "__main__":
    main()
