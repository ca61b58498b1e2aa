from sst_tpu.train.state import TrainState, create_train_state, make_optimizer
from sst_tpu.train.step import make_data_mesh, make_jitted_train_step, shard_batch, train_step
from sst_tpu.train.schedules import DisableAugmentationSchedule, FSDDetectionSchedule
