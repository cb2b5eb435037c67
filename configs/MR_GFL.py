# Moment-retrieval model structure.
#
# This file is exec-compatible with the reference's nncore-style config
# surface (the framework reads the `model` dict; `_base_` lines are accepted
# and ignored). Values correspond to the standard MR setup: a 4-level
# temporal pyramid with focal classification, L1 boundary regression and the
# sampled-NCE saliency alignment loss.

_strides = (1, 2, 4, 8)          # pyramid downsampling factors
_anchor_buffer = 1024            # max anchor points cached per level
_top_moments = 50                # ranked moments emitted per query

model = dict(
    strides=_strides,
    buffer_size=_anchor_buffer,
    max_num_moment=_top_moments,
    pyramid_cfg=dict(type="ConvPyramid"),
    pooling_cfg=dict(type="AdaPooling"),
    coord_head_cfg=dict(type="ConvHead", kernal_size=3),
    loss_cfg=dict(
        type="BundleLoss",
        sample_radius=1.5,                      # center-sampling radius
        loss_qfl=dict(type="QualityFocalLoss"), # IoU-aware classification
        loss_reg=dict(type="L1Loss"),           # boundary offsets
        loss_sal=dict(type="SampledNCELoss"),   # clip/query alignment
    ),
)
