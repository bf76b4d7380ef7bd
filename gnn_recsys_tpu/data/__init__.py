from gnn_recsys_tpu.data.presplit import presplit_data  # noqa: F401
from gnn_recsys_tpu.data.etl import GraphData  # noqa: F401
from gnn_recsys_tpu.data.split import train_valid_split, TrainValSplit  # noqa: F401
