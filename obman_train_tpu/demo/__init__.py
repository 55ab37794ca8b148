from obman_train_tpu.demo.inference import DemoModel
from obman_train_tpu.demo.attention import attention_overlay
from obman_train_tpu.demo.export import export_model, load_exported

__all__ = ["DemoModel", "attention_overlay", "export_model", "load_exported"]
