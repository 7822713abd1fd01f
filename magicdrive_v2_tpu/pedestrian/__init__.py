from .pose import PoseProcessor
