"""AOT model export: self-contained StableHLO serving artifacts.

The reference framework deploys by unpickling TF graphs next to the
model code (reference `vae_assoc.py` `save_model`/`restore_model` via
`tf.train.Saver` — per SURVEY.md §2.1); serving a model there requires
the full Python class tree at load time. The TPU-native answer is
`jax.export`: each inference endpoint is traced ONCE with a *symbolic*
batch dimension and serialized as a versioned StableHLO module with the
trained weights embedded as constants. The artifact directory is
self-contained — loading it needs no model classes, no checkpoint
restore, and no re-tracing of Python model code; any batch size works.

    from vae_assoc_tpu.export import export_predictor, ExportedPredictor

    export_predictor(Predictor.load(model_dir), out_dir)
    ...                                        # later / elsewhere
    ep = ExportedPredictor.load(out_dir)
    traj = ep.cross_generate(imgs, "image", "trajectory")

Design notes:

- **Symbolic batch** (`jax.export.symbolic_shape("b, n")`): one artifact
  per endpoint instead of one per (endpoint, bucket). The deserialized
  module still XLA-compiles per concrete shape at call time, so
  `ExportedPredictor` keeps the same power-of-two bucketing as
  `serve.Predictor` — the warmed compile set stays bounded.
- **Weights are embedded** in the module as constants: the export closes
  over the Predictor's params. At the reference archs this is a few MB
  per endpoint — self-containment is worth the duplication. Re-export to
  pick up new weights.
- **Always the jnp formulation** (`use_pallas=False`), regardless of the
  Predictor's kernel setting: Pallas kernels lower to Mosaic custom
  calls, whose serialized form carries no cross-version compatibility
  guarantee, while pure-StableHLO artifacts hold jax.export's ≥6-month
  backward-compat window. Kernel-vs-jnp numerical parity is asserted in
  tests/test_kernels.py; inference tolerances absorb the difference.
- **Multi-platform**: pass `platforms=("cpu", "tpu")` to emit one
  artifact runnable on both backends (export runs on either; the lowered
  module carries both code paths).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Optional, Sequence, Union

import numpy as np

MANIFEST = "manifest.json"
_FORMAT = 1


def _endpoint_fns(params, cfg, compute_dtype):
    """(name -> (fn, arg_builder)) for every serving endpoint.

    arg_builder(scope) returns the symbolic ShapeDtypeStructs; all specs
    of one endpoint share one scope so their batch symbols unify.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from vae_assoc_tpu.models import assoc as assoc_mod

    kw = dict(cfg=cfg, compute_dtype=compute_dtype, use_pallas=False)
    k = len(cfg.modalities)
    n_in = [m.arch["n_input"] for m in cfg.modalities]
    n_z = cfg.modalities[0].arch["n_z"]
    n_c = cfg.n_cond  # conditional models: every endpoint gains a cond arg

    def sym(scope, n):
        return jax.ShapeDtypeStruct(
            jexport.symbolic_shape(f"b, {n}", scope=scope), jnp.float32
        )

    fns = {}
    # transform takes the trailing-cond batch-list convention directly, so
    # its traced signature stays "one list" either way.
    fns["transform"] = (
        jax.jit(lambda xs: assoc_mod.transform(params, xs, **kw)),
        lambda scope: ([sym(scope, n) for n in n_in]
                       + ([sym(scope, n_c)] if n_c else []),),
    )
    for j in range(k):
        if n_c:
            fn_g = jax.jit(functools.partial(
                lambda z, c, j: assoc_mod.generate(
                    params, z, modality=j, cond=c, **kw), j=j))
            build_g = lambda scope: (sym(scope, n_z), sym(scope, n_c))
        else:
            fn_g = jax.jit(functools.partial(
                lambda z, j: assoc_mod.generate(params, z, modality=j, **kw),
                j=j))
            build_g = lambda scope: (sym(scope, n_z),)
        fns[f"generate_{j}"] = (fn_g, build_g)
    for i in range(k):
        for j in range(k):
            if n_c:
                fn_c = jax.jit(functools.partial(
                    lambda x, c, i, j: assoc_mod.cross_generate(
                        params, x, src=i, dst=j, cond=c, **kw),
                    i=i, j=j))
                build_c = functools.partial(
                    lambda scope, i: (sym(scope, n_in[i]), sym(scope, n_c)),
                    i=i)
            else:
                fn_c = jax.jit(functools.partial(
                    lambda x, i, j: assoc_mod.cross_generate(
                        params, x, src=i, dst=j, **kw),
                    i=i, j=j))
                build_c = functools.partial(
                    lambda scope, i: (sym(scope, n_in[i]),), i=i)
            fns[f"cross_generate_{i}_{j}"] = (fn_c, build_c)
    return fns


def export_predictor(predictor, out_dir: str, *,
                     platforms: Optional[Sequence[str]] = None) -> dict:
    """Serialize every serving endpoint of `predictor` under `out_dir`.

    Returns the manifest dict (also written to ``out_dir/manifest.json``).
    `platforms`: lowering platforms, e.g. ``("cpu", "tpu")``; default is
    the exporting process's backend.
    """
    import jax
    from jax import export as jexport

    from vae_assoc_tpu.configs import config_to_dict

    os.makedirs(out_dir, exist_ok=True)
    fns = _endpoint_fns(predictor.params, predictor.cfg,
                        predictor.compute_dtype)
    endpoints = {}
    exported_platforms = None
    for name, (fn, build) in fns.items():
        scope = jexport.SymbolicScope()
        exp = jexport.export(
            fn, platforms=tuple(platforms) if platforms else None
        )(*build(scope))
        exported_platforms = list(exp.platforms)
        fname = f"{name}.stablehlo"
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(exp.serialize())
        endpoints[name] = fname
    manifest = {
        "format": _FORMAT,
        "jax_version": jax.__version__,
        "platforms": exported_platforms,
        "config": config_to_dict(predictor.cfg),
        "endpoints": endpoints,
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ExportedPredictor:
    """Serving endpoints over a `export_predictor` artifact directory.

    Mirrors `serve.Predictor`'s endpoint API (so `serve_http.ModelServer`
    and `serve.MicroBatcher` accept either — duck-typed on
    cross_generate/transform/generate/reconstruct + cfg), but runs the
    deserialized StableHLO modules: no model code, no checkpoint restore.
    Same power-of-two bucketing; `warmup()` bounds the compile set.
    """

    def __init__(self, exported: dict, cfg, manifest: dict):
        import jax

        self.cfg = cfg
        self.manifest = manifest
        # jit(exp.call) caches the per-bucket executables exactly like
        # Predictor's jitted partials do.
        self._call = {name: jax.jit(exp.call)
                      for name, exp in exported.items()}

    @classmethod
    def load(cls, path: str) -> "ExportedPredictor":
        from jax import export as jexport

        from vae_assoc_tpu.configs import config_from_dict

        # Normalize once and use it everywhere: open() does not expand '~',
        # so reading endpoint files with the raw path would FileNotFoundError
        # on the same directory whose manifest just resolved fine.
        path = os.path.abspath(os.path.expanduser(path))
        mpath = os.path.join(path, MANIFEST)
        if not os.path.exists(mpath):
            raise FileNotFoundError(
                f"no {MANIFEST} under {path} — write artifacts with "
                "export_predictor() first")
        with open(mpath) as f:
            manifest = json.load(f)
        if manifest.get("format") != _FORMAT:
            raise ValueError(
                f"unsupported export format {manifest.get('format')!r} "
                f"(this build reads format {_FORMAT})")
        cfg, _ = config_from_dict(manifest["config"])
        exported = {}
        for name, fname in manifest["endpoints"].items():
            with open(os.path.join(path, fname), "rb") as f:
                exported[name] = jexport.deserialize(f.read())
        return cls(exported, cfg, manifest)

    # -- endpoints ---------------------------------------------------------
    # Pad/chunk bucketing is bucketing.py's (the exact code the live
    # serve.Predictor runs — numpy-only, so the no-model-code constraint
    # of a self-contained artifact still holds). The exported StableHLO
    # programs are traced at float32, hence the cast before chunking.
    def _cond(self, cond, batch):
        from vae_assoc_tpu import bucketing

        # bucketing.check_cond: the ONE serving-side gate (serve/export/http).
        return bucketing.check_cond(cond, self.cfg.n_cond, batch)

    def cross_generate(self, x, src: Union[int, str], dst: Union[int, str],
                       *, cond=None):
        from vae_assoc_tpu import bucketing

        src = self.cfg.modality_index(src)
        dst = self.cfg.modality_index(dst)
        x = np.asarray(x, np.float32)
        cond = self._cond(cond, x.shape[0])
        call = self._call[f"cross_generate_{src}_{dst}"]
        return bucketing.chunked_cond_call(
            lambda xp, cp: call(xp) if cp is None else call(xp, cp), x, cond
        )

    def reconstruct(self, x, modality: Union[int, str], *, cond=None):
        i = self.cfg.modality_index(modality)
        return self.cross_generate(x, i, i, cond=cond)

    def generate(self, z, modality: Union[int, str], *, cond=None):
        from vae_assoc_tpu import bucketing

        j = self.cfg.modality_index(modality)
        z = np.asarray(z, np.float32)
        cond = self._cond(cond, z.shape[0])
        call = self._call[f"generate_{j}"]
        return bucketing.chunked_cond_call(
            lambda zp, cp: call(zp) if cp is None else call(zp, cp), z, cond
        )

    def transform(self, xs: Sequence[np.ndarray]):
        from vae_assoc_tpu import bucketing

        xs = list(xs)
        k = len(self.cfg.modalities)
        if self.cfg.n_cond:
            # Check arity HERE: the exported module was traced with k+1
            # args, so a missing cond would otherwise surface as an opaque
            # jax.export arity error instead of this message.
            if len(xs) != k + 1:
                raise ValueError(
                    f"conditional model (n_cond={self.cfg.n_cond}): "
                    f"transform takes [x_0..x_{k-1}, cond], got {len(xs)} "
                    "entries"
                )
            xs[k] = self._cond(xs[k], np.asarray(xs[0]).shape[0])
        elif len(xs) != k:
            raise ValueError(f"expected {k} modality inputs, got {len(xs)}")
        return bucketing.chunked_multi_call(
            self._call["transform"],
            [np.asarray(x, np.float32) for x in xs],
        )

    def warmup(self, buckets: Sequence[int] = (64, 256, 1024), *,
               all_endpoints: bool = False) -> None:
        """Pre-compile endpoints per bucket (same contract as Predictor)."""
        from vae_assoc_tpu import bucketing

        bucketing.warmup_endpoints(
            self, self.cfg, buckets, all_endpoints=all_endpoints
        )


def main(argv=None) -> int:
    """CLI: write a serving artifact from a `save_model` directory.

        python -m vae_assoc_tpu.export /path/to/save_model_dir out_dir \\
            [--platforms cpu tpu]
    """
    import argparse

    p = argparse.ArgumentParser(prog="vae_assoc_tpu.export",
                                description=__doc__)
    p.add_argument("model_dir", help="save_model directory (model_config.json)")
    p.add_argument("out_dir", help="artifact directory to write")
    p.add_argument("--platforms", nargs="+", default=None,
                   metavar="PLATFORM",
                   help="lowering platforms, e.g. --platforms cpu tpu for a "
                        "dual-backend artifact (default: this process's "
                        "backend)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (overrides any TPU plugin)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        # Same idiom as train.driver --cpu: env vars are too late once a
        # TPU PJRT plugin pre-registered at interpreter start; the config
        # update still wins (lazy backends).
        jax.config.update("jax_platforms", "cpu")

    from vae_assoc_tpu.serve import Predictor

    manifest = export_predictor(Predictor.load(args.model_dir), args.out_dir,
                                platforms=args.platforms)
    print(f"exported {len(manifest['endpoints'])} endpoints "
          f"(platforms={manifest['platforms']}) -> {args.out_dir}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
