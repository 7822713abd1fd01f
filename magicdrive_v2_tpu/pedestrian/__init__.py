from .pose import PoseProcessor
from .processor import (BodyModel, PedestrianProcessor, SegformerSegmenter,
                        SyntheticBody, SyntheticSegmenter, SyntheticSmplFitter,
                        make_synthetic_processor)
from .smpl import (Hmr2SmplFitter, SmplBody, load_smpl_pickle,
                   make_real_processor)
