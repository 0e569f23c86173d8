from .datasets import (
    CrossValidation,
    DecathlonDataset,
    MedNISTDataset,
    TciaDataset,
    load_decathlon_datalist,
    load_decathlon_properties,
)
from .utils import check_hash, download_and_extract, download_url, extractall, get_logger
