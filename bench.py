"""Headline benchmark: full MaxStyle adversarial training throughput.

Workload = the reference's headline training configuration
(config/ACDC/1500_epoch/MICCAI2022_MaxStyle.json): FCN_16_standard_no_STN
dual-branch net, batch 20, 192x192x1 inputs, AdamW 1e-4, MaxStyle inner loop
Adam(0.1) x 5 iterations on decoder layers [3,4,5] — one jitted step
covering standard training + style generation + hard-example training.

The reference publishes no throughput numbers (BASELINE.md), so
`vs_baseline` is null; the recorded steps/sec series across rounds is the
regression baseline.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from __graft_entry__ import _flagship_solver
    from maxstyle_tpu.train_step import make_train_step

    batch, hw = 20, 192
    solver = _flagship_solver(hw=hw, batch=batch, max_style=True)
    state = solver.init_state(jax.random.key(0), (hw, hw), batch_size=batch)
    step = make_train_step(solver)

    key = jax.random.key(1)
    image = jnp.clip(0.5 + 0.25 * jax.random.normal(key, (batch, hw, hw, 1)), 0, 1)
    label = jax.random.randint(jax.random.key(2), (batch, hw, hw), 0, 4)
    batch_data = {"image": image, "label": label}

    # warmup/compile
    state, metrics = step(state, batch_data, jax.random.key(10))
    jax.block_until_ready(metrics)

    n_steps, n_repeats = 50, 3
    rates = []
    for r in range(n_repeats):
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, metrics = step(state, batch_data,
                                  jax.random.fold_in(jax.random.key(11), r * n_steps + i))
        jax.block_until_ready(metrics)
        rates.append(n_steps / (time.perf_counter() - t0))
    rates.sort()
    steps_per_sec = rates[len(rates) // 2]  # median

    print(json.dumps({
        "metric": "maxstyle_train_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s (batch 20, 192x192, inner adv loop n_iter=5)",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
