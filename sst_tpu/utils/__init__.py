from sst_tpu.utils.config import deep_merge, load_config, set_by_dotted
from sst_tpu.utils.registry import DATASETS, DETECTORS, MODELS, PIPELINES, Registry, build_detector
