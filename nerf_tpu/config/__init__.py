from .config import Config, default_cfg, load_cfg, make_cfg, parse_args

__all__ = ["Config", "default_cfg", "load_cfg", "make_cfg", "parse_args"]
