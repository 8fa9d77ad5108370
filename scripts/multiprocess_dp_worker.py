"""Multi-process DP worker: one JAX process of a multi-controller run.

Validates the multi-host path (SURVEY.md §5 "Distributed communication
backend") without a cluster: N processes × 4 virtual CPU devices each,
`jax.distributed.initialize` + Gloo cross-process collectives, the
2-level `('replica', 'data')` mesh from `make_multihost_mesh`, and the
production `make_dp_train_step` with `batch_axes=("replica", "data")` —
gradient sync spans BOTH mesh levels (the DCN leg on real pods) in one
logical pmean. Launched by tests/test_multiprocess.py; runnable by hand:

    python scripts/multiprocess_dp_worker.py <proc> <nproc> <port>

Prints one `METRICS <proc> <step> <total>` line per step; the launcher
asserts the losses are identical across processes and match a
single-process run of the same mesh shape on the same global batch.
"""

import sys

import jax


def main(proc: int, nproc: int, port: str) -> int:
    # Device provisioning must precede any device query (same constraint as
    # __graft_entry__._ensure_n_devices).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nproc, process_id=proc
    )
    assert jax.process_count() == nproc, jax.process_count()

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vae_assoc_tpu.configs import AssocConfig, ModalityConfig, TrainConfig
    from vae_assoc_tpu.parallel import make_dp_train_step, make_multihost_mesh
    from vae_assoc_tpu.train.step import init_train_state

    arch = dict(
        n_input=24,
        n_z=4,
        n_hidden_recog_1=16,
        n_hidden_recog_2=16,
        n_hidden_gener_1=16,
        n_hidden_gener_2=16,
    )
    cfg = AssocConfig(
        [
            ModalityConfig("image", arch, recon="bernoulli"),
            ModalityConfig("trajectory", dict(arch), recon="gaussian"),
        ],
        assoc_lambda=0.5,
    )
    n_dev = nproc * 4
    tc = TrainConfig(batch_size=4 * n_dev, learning_rate=1e-3)

    mesh = make_multihost_mesh()  # (nproc, 4) ('replica', 'data')
    assert mesh.devices.shape == (nproc, 4), mesh.devices.shape
    batch_axes = ("replica", "data")

    # Replicated state: computed under jit (global arrays work across
    # processes when jit-produced; host device_put cannot reach
    # non-addressable devices).
    state = jax.jit(
        lambda: init_train_state(cfg, tc), out_shardings=NamedSharding(mesh, P())
    )()
    step_fn = make_dp_train_step(cfg, tc, mesh, batch_axes=batch_axes)

    rng = np.random.default_rng(7)  # same stream in every process
    spec = NamedSharding(mesh, P(batch_axes))
    rows_here = tc.batch_size // nproc
    lo = proc * rows_here
    for step in range(3):
        x_img = rng.uniform(0, 1, (tc.batch_size, 24)).astype(np.float32)
        x_traj = rng.normal(size=(tc.batch_size, 24)).astype(np.float32)
        xs = tuple(
            jax.make_array_from_process_local_data(spec, d[lo : lo + rows_here])
            for d in (x_img, x_traj)
        )
        state, metrics = step_fn(state, xs)
        total = float(jax.device_get(metrics["total"]))
        print(f"METRICS {proc} {step} {total:.6f}", flush=True)

    # Params stay replicated: every addressable shard of a weight is equal.
    w = state.params["modalities"][0]["recog"]["h1"]["w"]
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)

    # Phase 2 — cross-process TENSOR parallelism: a (nproc·2, 2)
    # ('data','model') mesh whose data axis spans processes. The Megatron
    # GSPMD shardings and their forward/backward all-reduces now execute
    # over the cross-process collective backend (Gloo here, DCN/ICI on
    # pods). State placement goes through tp._placer's jit-identity path
    # (device_put cannot reach non-addressable devices).
    from jax.sharding import Mesh
    from vae_assoc_tpu.parallel import make_tp_train_step
    from vae_assoc_tpu.parallel.tp import shard_tp_train_state

    devices = np.asarray(jax.devices()).reshape(nproc * 2, 2)
    mesh2 = Mesh(devices, ("data", "model"))
    tp_state = shard_tp_train_state(mesh2, init_train_state(cfg, tc), cfg, tc)
    tp_step = make_tp_train_step(cfg, tc, mesh2)
    rng2 = np.random.default_rng(11)  # same stream in every process
    spec2 = NamedSharding(mesh2, P("data"))
    for step in range(2):
        x_img = rng2.uniform(0, 1, (tc.batch_size, 24)).astype(np.float32)
        x_traj = rng2.normal(size=(tc.batch_size, 24)).astype(np.float32)
        xs = tuple(
            jax.make_array_from_process_local_data(spec2, d[lo : lo + rows_here])
            for d in (x_img, x_traj)
        )
        tp_state, metrics = tp_step(tp_state, xs)
        total = float(jax.device_get(metrics["total"]))
        print(f"TPMETRICS {proc} {step} {total:.6f}", flush=True)

    # Phase 3 — cross-process combined TP×FSDP (round 3): same 2-D mesh,
    # one spec tree carrying BOTH the Megatron model-axis splits and the
    # ZeRO data-axis shards — so the JIT weight all-gathers and gradient
    # reduce-scatters now also cross the process boundary.
    from vae_assoc_tpu.parallel import make_tp_fsdp_train_step
    from vae_assoc_tpu.parallel.tp_fsdp import shard_tp_fsdp_train_state

    cf_state = shard_tp_fsdp_train_state(mesh2, init_train_state(cfg, tc), cfg, tc)
    cf_step = make_tp_fsdp_train_step(cfg, tc, mesh2)
    rng3 = np.random.default_rng(13)  # same stream in every process
    for step in range(2):
        x_img = rng3.uniform(0, 1, (tc.batch_size, 24)).astype(np.float32)
        x_traj = rng3.normal(size=(tc.batch_size, 24)).astype(np.float32)
        xs = tuple(
            jax.make_array_from_process_local_data(spec2, d[lo : lo + rows_here])
            for d in (x_img, x_traj)
        )
        cf_state, metrics = cf_step(cf_state, xs)
        total = float(jax.device_get(metrics["total"]))
        print(f"TFMETRICS {proc} {step} {total:.6f}", flush=True)

    # Phase 4 — cross-process shard_map ZeRO (round 3): a 1-D ('data',)
    # mesh over ALL devices spanning both processes. The hand-written
    # weight all-gathers and gradient reduce-scatters (parallel/zero.py)
    # now ride the cross-process collective backend; state placement goes
    # through tp._placer's jit-identity path inside shard_zero_train_state.
    from vae_assoc_tpu.parallel import make_zero_train_step
    from vae_assoc_tpu.parallel.zero import shard_zero_train_state

    mesh1 = Mesh(np.asarray(jax.devices()), ("data",))
    z_state = shard_zero_train_state(mesh1, init_train_state(cfg, tc), cfg, tc)
    # Flat shards really span the global mesh: each process addresses
    # 4 of the 8 equal slices of every padded leaf.
    w1 = z_state.params["modalities"][0]["recog"]["h1"]["w"]
    assert w1.ndim == 1 and w1.shape[0] % n_dev == 0, w1.shape
    local = {s.data.shape for s in w1.addressable_shards}
    assert local == {(w1.shape[0] // n_dev,)}, local
    assert len(w1.addressable_shards) == 4
    z_step = make_zero_train_step(cfg, tc, mesh1)
    rng4 = np.random.default_rng(17)  # same stream in every process
    spec1 = NamedSharding(mesh1, P("data"))
    for step in range(2):
        x_img = rng4.uniform(0, 1, (tc.batch_size, 24)).astype(np.float32)
        x_traj = rng4.normal(size=(tc.batch_size, 24)).astype(np.float32)
        xs = tuple(
            jax.make_array_from_process_local_data(spec1, d[lo : lo + rows_here])
            for d in (x_img, x_traj)
        )
        z_state, metrics = z_step(z_state, xs)
        total = float(jax.device_get(metrics["total"]))
        print(f"ZMETRICS {proc} {step} {total:.6f}", flush=True)

    print(f"DONE {proc}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]))
