"""cdnet_tpu — a TPU-native framework for nuclear instance segmentation.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of CDNet
("Centripetal Direction Network for Nuclear Instance Segmentation", ICCV 2021;
reference implementation honglianghe/CDNet). Everything in the hot path —
model forward/backward, label synthesis (EDT, centerpoint, Sobel direction
quantization), direction-difference maps, test-time augmentation, sliding
window stitching, and instance post-processing (morphology, connected
components, watershed) — runs on device as jit-compiled XLA programs, scaled
over a `jax.sharding.Mesh`.

Layout
------
- :mod:`cdnet_tpu.config`      — dataclass config (flag parity with reference options.py)
- :mod:`cdnet_tpu.models`      — flax.linen model zoo (UNet / FullNet / VGG16-UNet+DAM / HRNet+DAM)
- :mod:`cdnet_tpu.ops`         — device ops: geometry, EDT, CC, morphology, watershed, DDM, TTA
- :mod:`cdnet_tpu.losses`      — CE / dice / weighted-dice / focal / boundary / variance / MSE
- :mod:`cdnet_tpu.metrics`     — pixel metrics, AJI/AJI+/PQ/Dice instance metrics
- :mod:`cdnet_tpu.parallel`    — mesh construction, sharded train/infer steps
- :mod:`cdnet_tpu.data`        — dataset pairing and augmentation pipeline
- :mod:`cdnet_tpu.train`       — training driver (reference train.py parity)
- :mod:`cdnet_tpu.infer`       — inference driver (reference test_dam.py parity)
"""

__version__ = "0.1.0"
