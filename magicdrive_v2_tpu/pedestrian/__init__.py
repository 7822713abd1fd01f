from .pose import PoseProcessor
from .processor import (BodyModel, PedestrianProcessor, SegformerSegmenter,
                        SyntheticBody, SyntheticSegmenter, SyntheticSmplFitter,
                        make_synthetic_processor)
