"""Device mesh / sharding helpers.

The reference's only collectives are DDP grad-allreduce + loss gather under HF
Accelerate/NCCL (reference: finetuning/base.py:90-96, cars.py:290-294). Here
the equivalent is a jax.sharding Mesh with XLA collectives over ICI:

  * axis "dp"   — batch data parallelism (training + typicality sweeps)
  * axis "fsdp" — optional parameter sharding (SD-v1.5 fits per chip, so this
                  defaults to 1; kept for pods/memory headroom)

No custom transport: pjit + NamedSharding lets XLA insert psum/all-gather.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    dp: Optional[int] = None,
    fsdp: int = 1,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // fsdp
    assert dp * fsdp <= n, f"mesh {dp}x{fsdp} > {n} devices"
    arr = np.asarray(devices[: dp * fsdp]).reshape(dp, fsdp)
    return Mesh(arr, ("dp", "fsdp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over dp (replicated over fsdp)."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_sharding(mesh: Mesh, param: jax.ShapeDtypeStruct) -> NamedSharding:
    """Shard the largest divisible axis of a parameter over fsdp."""
    fsdp_size = mesh.shape["fsdp"]
    if fsdp_size == 1:
        return NamedSharding(mesh, P())
    shape = param.shape
    # pick the largest axis divisible by fsdp_size
    best = None
    for i, s in enumerate(shape):
        if s % fsdp_size == 0 and (best is None or s > shape[best]):
            best = i
    if best is None:
        return NamedSharding(mesh, P())
    spec = [None] * len(shape)
    spec[best] = "fsdp"
    return NamedSharding(mesh, P(*spec))


def shard_params(mesh: Mesh, params):
    """Place a param pytree: fsdp-shard big tensors, replicate the rest."""
    def place(x):
        sds = jax.ShapeDtypeStruct(x.shape, x.dtype) if hasattr(x, "shape") else None
        sh = fsdp_sharding(mesh, sds) if sds is not None and x.ndim >= 1 else replicated(mesh)
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(place, params)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init for TPU pods (SURVEY.md §5.8: replaces the reference's
    NCCL/Accelerate process group). On TPU pods jax.distributed discovers the
    topology from the environment; explicit args cover CPU/GPU clusters.
    Call once per host before building the mesh. No-op if already initialized
    or single-process."""
    import jax

    try:
        if coordinator_address is None and num_processes is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
    except (ValueError, RuntimeError) as e:  # already initialized / single host
        if "already" not in str(e).lower():
            raise


def host_local_batch_slice(global_batch: int) -> slice:
    """The slice of a globally-sharded batch this host should feed
    (process-local data loading for pods). Callers: BatchIterator
    (finetuning/datasets.py) and the typicality sweep's group dispatch
    (typicality/compute.py + engine.py via globalize_batch)."""
    import jax

    n = jax.process_count()
    assert global_batch % n == 0, (
        f"global batch {global_batch} must divide by process count {n}"
    )
    per_host = global_batch // n
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def globalize_batch(mesh: Mesh, x, spec: P = P("dp"), local: bool = False):
    """Host batch -> global jax.Array sharded over `spec`.

    Single-process: a plain device_put (no copy semantics change). Multi-
    process (TPU pod): with local=False, `x` is the FULL logical batch,
    identical on every host (deterministic queue order) and each process
    contributes its host_local_batch_slice; with local=True, `x` is already
    this host's slice (e.g. from BatchIterator's process_slice). Either way
    the global array is assembled without any cross-host transfer.
    Already-global arrays pass through untouched.
    """
    import jax

    sh = NamedSharding(mesh, spec)
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return x  # already a global (process-spanning) array
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    arr = np.asarray(x)
    if not local:
        arr = arr[host_local_batch_slice(arr.shape[0])]
    return jax.make_array_from_process_local_data(sh, arr)


def replicate_global(mesh: Mesh, tree):
    """Place a host pytree as fully-replicated arrays over the (possibly
    multi-process) mesh. Every host must hold identical values — true for
    deterministic inits and checkpoint restores, which is where this is used
    (finetuning/base.py multi-host setup)."""
    import jax

    sh = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sh)

    def leaf(x):
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree_util.tree_map(leaf, tree)


_barrier_seq = 0


def host_barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Align all processes at a named coordination-service barrier (gRPC,
    generous timeout). Used before collective-bearing host work (orbax saves)
    whose OWN rendezvous has a short fixed window: XLA's Gloo CPU collectives
    time out context init after 30 s, so if processes arrive skewed (e.g. one
    just compiled a preview sampler on a loaded core) the save dies with
    'Gloo context initialization failed: DEADLINE_EXCEEDED'. Aligning here
    first makes the short-window rendezvous start in lockstep. No-op
    single-process or when jax.distributed is not initialized."""
    import jax

    if jax.process_count() == 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        return
    global _barrier_seq
    _barrier_seq += 1
    client.wait_at_barrier(f"diffmining_{name}_{_barrier_seq}", timeout_in_ms=timeout_ms)


def fetch_replicated(x) -> np.ndarray:
    """Local numpy view of a fully-REPLICATED array. Multi-process global
    arrays are not fully addressable so np.asarray raises on them, but under
    P() replication every device shard IS the whole array — read one local
    shard instead of a collective fetch (finetuning/base.py sample())."""
    import jax

    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return np.asarray(x.addressable_data(0))
    return np.asarray(x)
