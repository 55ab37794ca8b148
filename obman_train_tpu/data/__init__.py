from obman_train_tpu.data.queries import BaseQueries, TransQueries, get_trans_queries
from obman_train_tpu.data.dataset import HandDataset
from obman_train_tpu.data.loader import BatchLoader, ConcatLoader, collate
from obman_train_tpu.data.synthetic import SyntheticDataset

__all__ = [
    "BaseQueries",
    "TransQueries",
    "get_trans_queries",
    "HandDataset",
    "BatchLoader",
    "ConcatLoader",
    "collate",
    "SyntheticDataset",
]
