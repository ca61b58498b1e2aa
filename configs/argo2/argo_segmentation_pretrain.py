# Argo2 segmentation pretrain (counterpart of the reference's
# configs/argo2/argo_segmentation_pretrain.py): the one-stage model trained
# with segmentation losses only — fsd_detection_schedule never enables
# detection, so every step runs the pretrain (seg-only) loss branch
# (SingleStageFSD.loss pretrain=True). The resulting checkpoint seeds
# argo_onestage_12e.py via tools/model_converters/fsd_pretrain_converter.py.
_base_ = ["argo_onestage_12e.py"]

schedule = dict(max_epochs=12)
fsd_detection_schedule = dict(enable_after=10**9, buffer_start=0.0,
                              delay_buffer_until=10**9)
