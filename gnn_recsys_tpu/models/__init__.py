from gnn_recsys_tpu.models.layers import ConvLayer, NodeEmbedding  # noqa: F401
from gnn_recsys_tpu.models.conv_model import ConvModel  # noqa: F401
from gnn_recsys_tpu.models.loss import max_margin_loss  # noqa: F401
