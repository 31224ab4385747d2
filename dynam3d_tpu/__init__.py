"""dynam3d_tpu — a TPU-native (JAX/XLA/Pallas/pjit) vision-and-language-navigation
framework with the capabilities of MrZihan/Dynam3D.

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):

    geom/      depth unprojection, frustum culling, ray grids (pure jnp)
    ops/       TPU kernels: masked k-NN, segment aggregation, NMS, fused MLPs
    models/    encoders (CLIP/depth/FastSAM-seg), 3D memory state machine,
               waypoint predictor, neural feature-field renderer, LLaVA-Phi-3 VLM
    parallel/  device meshes, sharding rules, collective training steps
    runtime/   host feed API, episode driver, trainers, checkpointing, metrics
    utils/     angle features, action-text codecs, misc

The reference's dynamic Python-object 3D memory (growing numpy arrays, dict id
maps, per-view kd-tree rebuilds — see /root/reference .../models/feature_fields.py)
is re-designed here as a fixed-capacity, masked, device-resident table state
machine updated by jittable batched scatter ops, so episode-long 3D memory stays
on device and the whole RGB-D -> 3D-tokens -> action step compiles to a handful
of XLA dispatches.
"""

__version__ = "0.1.0"
