# Highlight-detection model structure.
#
# Exec-compatible with the reference's data/HD.py surface. HD uses a single
# full-resolution level (no boundary regression): classification against the
# per-clip saliency targets via the dynamic BCE loss, plus row-direction
# sampled-NCE alignment.

_strides = (1,)                  # single full-resolution level
_anchor_buffer = 2048            # long videos (TVSum max_v_l=1000)
_top_moments = 50

model = dict(
    strides=_strides,
    buffer_size=_anchor_buffer,
    max_num_moment=_top_moments,
    pyramid_cfg=dict(type="ConvPyramid"),
    pooling_cfg=dict(type="AdaPooling"),
    coord_head_cfg=dict(type="ConvHead", kernal_size=3),
    loss_cfg=dict(
        type="BundleLoss",
        loss_cls=dict(type="DynamicBCELoss"),
        loss_reg=None,
        loss_sal=dict(type="SampledNCELoss", direction="row"),
    ),
)
