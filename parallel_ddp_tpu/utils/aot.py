"""Ahead-of-time (AOT) program cache: persist traced programs across processes.

WHY.  The flagship Kuka programs embed the unrolled scalar-channel RBD
(models/kuka/soa.py) — hundreds of thousands of primitive applications.  XLA's
persistent *executable* cache (parallel_ddp_tpu/__init__.py) removes the
compile cost across processes, but jax must still *trace* the Python into
StableHLO every process, and for the N=64 solver that is minutes of pure
single-core Python — observed ~220 s per bench stage, dwarfing both the
compile-cache load and the measurement itself.  The reference has no analog
(C++ templates are "traced" by nvcc once per build); for a production TPU
framework the analog of shipping a compiled binary is shipping the exported
StableHLO: `jax.export` serialize on first build, deserialize + call later —
deserialization is milliseconds, and the re-compile underneath hits the
persistent executable cache because the embedded module bytes are identical.

SAFETY.  An AOT artifact silently pinned to stale code would be a correctness
trap, so entries are keyed by (a) a source digest over parallel_ddp_tpu/
(any package change invalidates every entry), (b) the digest of the CALLING
module's source (passed as `src=__file__` by each benchmark, so editing one
benchmark invalidates only its own programs instead of the whole cache — the
r4/r5 full-re-warm cost), (c) jax version, (d) backend platform, and (e) the
abstract signature (shape/dtype pytree) of the example arguments.  On any
mismatch the caller transparently falls back to live tracing and the entry
is re-exported.

Use `PARALLEL_DDP_TPU_AOT=0` to disable, or `PARALLEL_DDP_TPU_AOT=<dir>` to
relocate the cache (default ~/.cache/parallel_ddp_tpu/aot).
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import tempfile

logger = logging.getLogger(__name__)

_SRC_DIGEST = None
_REGISTERED = False


def _aot_dir() -> str | None:
    v = os.environ.get("PARALLEL_DDP_TPU_AOT", "")
    if v == "0":
        return None
    if v:
        return v
    return os.path.expanduser("~/.cache/parallel_ddp_tpu/aot")


def _source_digest() -> str:
    """Digest of every .py under parallel_ddp_tpu/ — the package-wide
    invalidation key (cheap: ~50 files, hashed once/process).  Benchmark
    modules are covered per-entry via the `src=` caller digest instead, so
    editing one benchmark no longer invalidates every export."""
    global _SRC_DIGEST
    if _SRC_DIGEST is not None:
        return _SRC_DIGEST
    h = hashlib.sha256()
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo_root = os.path.dirname(pkg_root)
    for dirpath, _dirnames, filenames in sorted(os.walk(pkg_root)):
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            p = os.path.join(dirpath, fn)
            h.update(os.path.relpath(p, repo_root).encode())
            with open(p, "rb") as f:
                h.update(f.read())
    _SRC_DIGEST = h.hexdigest()[:24]
    return _SRC_DIGEST


def _caller_digest(src) -> str:
    """Digest of the calling module's source file(s) (the `src=` key)."""
    if src is None:
        return ""
    paths = [src] if isinstance(src, str) else list(src)
    h = hashlib.sha256()
    for p in sorted(paths):
        h.update(os.path.basename(p).encode())
        try:
            with open(p, "rb") as f:
                h.update(f.read())
        except OSError:
            h.update(b"<unreadable>")
    return h.hexdigest()[:16]


def _register_serializations() -> None:
    """Register the package's public pytree containers for jax.export.
    Idempotent; extend as new output containers appear at AOT boundaries."""
    global _REGISTERED
    if _REGISTERED:
        return
    from jax import export as jexport

    from parallel_ddp_tpu.config import CostWeights, SolveOutput
    from parallel_ddp_tpu.mpc.device_loop import DeviceLoopResult
    from parallel_ddp_tpu.mpc.driver import MPCState, MPCStepInfo

    for cls in (SolveOutput, CostWeights, DeviceLoopResult, MPCState,
                MPCStepInfo):
        try:
            jexport.register_namedtuple_serialization(
                cls, serialized_name=f"parallel_ddp_tpu.{cls.__name__}")
        except ValueError:
            pass  # already registered in this process
    _REGISTERED = True


def _signature(example_args) -> str:
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(example_args)
    sig = [(str(jax.typeof(l)) if hasattr(jax, "typeof")
            else f"{getattr(l, 'dtype', type(l).__name__)}"
            f"{getattr(l, 'shape', ())}")
           for l in leaves]
    return hashlib.sha256(
        (str(treedef) + "|" + "|".join(sig)).encode()).hexdigest()[:16]


def _meta(name: str, example_args, src=None) -> dict:
    import jax

    return {
        "name": name,
        "src_digest": _source_digest(),
        "caller_digest": _caller_digest(src),
        "jax_version": jax.__version__,
        "backend": jax.default_backend(),
        "signature": _signature(example_args),
    }


def _paths(name: str) -> tuple[str, str] | None:
    d = _aot_dir()
    if d is None:
        return None
    safe = "".join(c if (c.isalnum() or c in "-_.") else "_" for c in name)
    return os.path.join(d, safe + ".jaxexp"), os.path.join(d, safe + ".json")


def load(name: str, example_args, src=None):
    """Return a jitted callable for a valid cached export of `name`, else
    None.  Validity = package digest + caller digest + jax version + backend
    + arg signature all match (see module docstring)."""
    p = _paths(name)
    if p is None:
        return None
    blob_path, meta_path = p
    try:
        with open(meta_path) as f:
            meta = json.load(f)
        if meta != _meta(name, example_args, src):
            logger.info("aot: stale entry for %s (key mismatch)", name)
            return None
        with open(blob_path, "rb") as f:
            blob = f.read()
    except (OSError, ValueError):
        return None
    try:
        import jax
        from jax import export as jexport

        _register_serializations()
        exported = jexport.deserialize(bytearray(blob))
        return jax.jit(exported.call)
    except Exception as e:  # noqa: BLE001 — fall back to live tracing
        logger.warning("aot: failed to deserialize %s: %s", name, e)
        return None


def save(name: str, jfn, example_args, src=None) -> bool:
    """Export jfn(*example_args) (pays one trace) and persist it under
    `name`.  Returns True on success; failures only log (an unexportable
    program — e.g. a custom call the exporter rejects — just stays on the
    live-tracing path)."""
    p = _paths(name)
    if p is None:
        return False
    blob_path, meta_path = p
    try:
        from jax import export as jexport

        _register_serializations()
        exported = jexport.export(jfn)(*example_args)
        blob = exported.serialize()
        os.makedirs(os.path.dirname(blob_path), exist_ok=True)
        for path, data, mode in ((blob_path, bytes(blob), "wb"),
                                 (meta_path,
                                  json.dumps(_meta(name, example_args, src)),
                                  "w")):
            fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
            with os.fdopen(fd, mode) as f:
                f.write(data)
            os.replace(tmp, path)
        return True
    except Exception as e:  # noqa: BLE001
        logger.warning("aot: failed to export %s: %s", name, e)
        return False


def cached_program(name: str, build, example_args, src=None):
    """The one-call integration point for the benchmarks.

    `build()` must return a jax.jit'd callable.  Returns `(callable,
    from_aot)`: a deserialized export when a valid entry exists (skipping the
    per-process trace entirely), else the live callable after persisting its
    export for the next process.

    `src`: path (or list of paths) of the calling module's source file(s),
    folded into the entry's validity key so editing that module invalidates
    only its own programs.  Pass `__file__`.
    """
    fn = load(name, example_args, src)
    if fn is not None:
        logger.info("aot: loaded %s", name)
        return fn, True
    jfn = build()
    if save(name, jfn, example_args, src):
        # return the freshly-saved export: jax.export already paid the trace,
        # so handing back `jfn` would trace a second time on its first call
        fn = load(name, example_args, src)
        if fn is not None:
            return fn, False
    return jfn, False
