"""tpuseg — TPU-native instance segmentation with hard-attention glimpse decoding.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
PyTorch research codebase ``Snoworday/instance-segmentation-attention``
(mounted read-only at /root/reference): CVPPP leaf instance segmentation via a
depthwise-residual UNet backbone, an iterative hard-attention instance decoder
(glimpse sampling + 5-level pyramid mask decoding, REINFORCE + focal/dice
pyramid losses), the full loss library, SBD/|DiC|/FG-Dice evaluation, and the
reference's dormant capabilities (SRU, DQN selector, WAE decoder, ConvGRU,
recurrent hourglass, CoordConv, VGG16).

Everything is re-designed TPU-first: NHWC layouts, static shapes, lax.scan
glimpse loops with validity masking, on-device categorical sampling,
data-parallel execution over a jax.sharding.Mesh, and Pallas kernels for the
hot masked-softmax / scan ops.
"""

__version__ = "0.1.0"
