from obman_train_tpu.demo.inference import DemoModel
from obman_train_tpu.demo.attention import attention_overlay

__all__ = ["DemoModel", "attention_overlay"]
