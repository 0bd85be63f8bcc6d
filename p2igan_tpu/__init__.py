"""p2igan_tpu — TPU-native rainfall point-to-image reconstruction framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
P2I-GAN benchmark reference (NTU-CompHydroMet-Lab/P2I-GAN-benchmark):
sparse-observation video-inpainting GANs for spatio-temporal rainfall
fields, with event datastores, mask generators, a GAN training loop,
sliding-window ensemble inference, and an offline evaluation suite.

Layer map (mirrors reference SURVEY.md §1, re-designed TPU-first):
  L1 data      p2igan_tpu.data      (zarrlite store, event readers, masks, datamodule)
  L2 ops       p2igan_tpu.ops       (DOConv, spectral norm, IDW k-NN, Wendland bases, Pallas kernels)
  L3 models    p2igan_tpu.models    (p2igan / dk / stdk / simple + registry)
  L4 eval      p2igan_tpu.losses, p2igan_tpu.metrics, experiments/
  L5 orch      p2igan_tpu.training, p2igan_tpu.inference
  L6 cli       scripts/
"""

__version__ = "0.1.0"


def _honor_jax_platforms_env() -> None:
    """Re-apply ``JAX_PLATFORMS`` if a site hook already imported jax.

    Some environments pre-import jax from ``sitecustomize`` (registering a
    TPU plugin) before any user code runs; by then the env var has been
    read and ``JAX_PLATFORMS=cpu python scripts/train.py`` silently still
    targets the TPU. If jax is already imported and its configured
    platforms disagree with the env var, reconcile them — this runs at
    package import, before any computation has been traced.
    """
    import os
    import sys

    want = os.environ.get("JAX_PLATFORMS")
    jax = sys.modules.get("jax")
    if not want or jax is None:
        return
    try:
        have = jax.config.jax_platforms or ""
        # the hook sets e.g. 'axon,cpu'; only the preferred (first) entry
        # matters — respect the env var's preference
        if have.split(",")[0] != want.split(",")[0]:
            jax.config.update("jax_platforms", want)
    except Exception as e:  # pragma: no cover - depends on site hook state
        import warnings

        warnings.warn(
            f"JAX_PLATFORMS={want!r} could not be re-applied after a site "
            f"hook pre-imported jax ({e}); computation may run on "
            f"{getattr(jax.config, 'jax_platforms', '?')!r} instead",
            RuntimeWarning, stacklevel=2)


_honor_jax_platforms_env()
