"""TCIA REST helpers (reference: monai/apps/tcia/utils.py).

All functions require network access to cancerimagingarchive.net, which is unavailable
in this environment (zero egress) — they raise a clear RuntimeError when called.
The API surface and constants are kept for parity.
"""
from __future__ import annotations

BASE_URL = "https://services.cancerimagingarchive.net/nbia-api/services/v1/"
DCM_FILENAME_REGEX = r"^\d+\.dcm$"


def _no_network(fn_name: str):
    raise RuntimeError(
        f"{fn_name} requires network access to the TCIA REST API, which is unavailable "
        "in this environment (zero egress). Download the series externally and point the "
        "dataset at the local files.")


def get_tcia_metadata(query: str, attribute: str | None = None):
    """(reference: tcia/utils.py get_tcia_metadata)."""
    _no_network("get_tcia_metadata")


def download_tcia_series_instance(series_uid: str, download_dir: str, output_dir: str,
                                  check_md5: bool = False, hashes_filename: str | None = None,
                                  progress: bool = True):
    """(reference: tcia/utils.py download_tcia_series_instance)."""
    _no_network("download_tcia_series_instance")


def get_tcia_ref_uid(ds, find_sop: bool = False,
                     ref_series_uid_tag=(0x0020, 0x000E), ref_sop_uid_tag=(0x0008, 0x1155)):
    """Extract a referenced series/SOP UID from a pydicom dataset
    (reference: tcia/utils.py get_tcia_ref_uid). Works locally (no network)."""
    output = ""
    if find_sop:
        ref_uid_tag = ref_sop_uid_tag
    else:
        ref_uid_tag = ref_series_uid_tag

    def _find(dataset):
        nonlocal output
        for elem in dataset:
            if elem.VR == "SQ":
                for item in elem.value:
                    _find(item)
            if elem.tag == ref_uid_tag:
                output = elem.value
        return output

    return _find(ds)


def match_tcia_ref_uid_in_study(study_uid, ref_series_uid):
    """(reference: tcia/utils.py match_tcia_ref_uid_in_study)."""
    _no_network("match_tcia_ref_uid_in_study")
