from . import embedding_net, multimodal_context, seq2seq, speech2gesture  # noqa: F401
from .factory import init_model  # noqa: F401
