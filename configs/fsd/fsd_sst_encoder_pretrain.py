# Segmentation pretrain for the SST-encoder FSD (counterpart of the
# reference's configs/fsd/fsd_sst_encoder_pretrain.py): train the
# SST-segmentor with segmentation losses only (the detection schedule never
# enables), then seed fsd_waymoD1_1x_sst_encoder.py via
# tools/model_converters/fsd_pretrain_converter.py.
_base_ = ["fsd_waymoD1_1x_sst_encoder.py"]

fsd_detection_schedule = dict(enable_after=10**9, buffer_start=0.0,
                              delay_buffer_until=10**9)
