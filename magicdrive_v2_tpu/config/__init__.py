from .config import Config, parse_configs, merge_dot_options, merge_dataset_cfg
from .yaml_compose import load_yaml_config

__all__ = ["Config", "parse_configs", "merge_dot_options", "merge_dataset_cfg", "load_yaml_config"]
