#!/usr/bin/env python
"""Example: full SPMD training over a device mesh (multi-chip or the
8-device virtual CPU mesh).

    python examples/distributed_training.py --shards 8 --steps 20
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--nodes", type=int, default=4096)
    ap.add_argument("--local_engine", default="tiled",
                    choices=("tiled", "hybrid", "coo"),
                    help="per-shard SpMM layout (tiled = flagship locality "
                         "engine: diagonal-block MXU tiles + hybrid rest)")
    ap.add_argument("--comm", default="halo",
                    choices=("halo", "all_gather"),
                    help="per-hop exchange: static halo plan (boundary rows "
                         "only) or full all_gather")
    args = ap.parse_args()

    import jax

    if jax.device_count() < args.shards:
        try:
            import jax.extend.backend as jeb

            jeb.clear_backends()
        except Exception:
            pass
        jax.config.update("jax_num_cpu_devices", args.shards)
        jax.config.update("jax_platforms", "cpu")

    from ssrg_tpu.configs.config import ModelConfig
    from ssrg_tpu.data.synthetic import planetoid_like
    from ssrg_tpu.models.zoo import load_model
    from ssrg_tpu.ops.normalize import sym_norm
    from ssrg_tpu.parallel.mesh import make_mesh
    from ssrg_tpu.parallel.dist_train import (
        build_spmd_context, run_epochs_scan,
    )

    mesh = make_mesh((args.shards,), ("graph",), jax.devices()[: args.shards])
    # community-structured SBM (communities smaller than a shard block) so
    # the cluster reorder gives the halo plan something to exploit — on a
    # structureless graph the halo saturates and build_spmd_context warns
    ds = planetoid_like(num_node=args.nodes,
                        num_classes=max(2 * args.shards, 5),
                        num_features=64, p_in=0.3, p_out=0.0004)
    cfg = ModelConfig(model_name="gamlp", prop_steps=3, hidden_dim=64)
    spec = load_model(cfg, ds.num_features, ds.num_classes)
    # round-4 fast path: cluster-aligned partition so shard boundaries follow
    # communities, per-shard TILED local engine, halo-only exchange — see
    # docs/SCALING.md ("coo" + "all_gather" is the baseline layout)
    comm = "all_gather" if args.local_engine == "coo" else args.comm
    if comm != args.comm:
        print(f"note: --comm {args.comm} requires a hybrid/tiled local "
              f"engine; the coo layout keeps global columns, falling back "
              f"to all_gather")
    ctx = build_spmd_context(
        sym_norm(ds.adj, cfg.r), ds.x, ds.y, ds.train_idx, spec.module,
        mesh, cfg.prop_steps, lr=0.01,
        local_engine=args.local_engine, comm=comm,
        reorder=None if args.local_engine == "coo" else "cluster",
        val_idx=ds.val_idx, test_idx=ds.test_idx,
    )
    # round-5 production shape: hops precomputed once under the mesh, then
    # ONE scanned dispatch trains all epochs with best-val->test tracking
    ctx, res = run_epochs_scan(ctx, args.steps)
    print(f"{args.shards}-shard SPMD training ({args.local_engine}/{comm}): "
          f"{args.steps} epochs in one dispatch, "
          f"loss {res.history[0][0]:.4f} -> {res.final_loss:.4f}, "
          f"best val {res.best_val:.4f}, best test {res.best_test:.4f}")


if __name__ == "__main__":
    main()
