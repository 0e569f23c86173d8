from .utils import (
    BASE_URL,
    DCM_FILENAME_REGEX,
    download_tcia_series_instance,
    get_tcia_metadata,
    get_tcia_ref_uid,
    match_tcia_ref_uid_in_study,
)
