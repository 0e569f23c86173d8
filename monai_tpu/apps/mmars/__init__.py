from .mmars import download_mmar, get_model_spec, load_from_mmar
from .model_desc import MODEL_DESC, RemoteMMARKeys
