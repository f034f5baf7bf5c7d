from vslnet_tpu.data.io import (  # noqa: F401
    load_json, save_json, load_lines, save_lines, load_pickle, save_pickle,
)
from vslnet_tpu.data.labels import (  # noqa: F401
    compute_overlap, time_to_index, index_to_time,
)
from vslnet_tpu.data.features import (  # noqa: F401
    visual_feature_sampling, load_video_features,
)
from vslnet_tpu.data.datasets import gen_or_load_dataset  # noqa: F401
