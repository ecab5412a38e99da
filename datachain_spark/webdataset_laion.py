"""LAION WebDataset models + npz metadata generator — parity with the
reference's ``lib/webdataset_laion.py`` (public multimodal examples
``wds.py`` / ``wds_filtered.py``). The LAION metadata schema is public
(laion.ai datasets); nothing here depends on the dataset itself."""

from __future__ import annotations

import warnings
from typing import Iterator, List, Optional

try:
    from pydantic import BaseModel, Field

    from .sources.files import File
    from .webdataset import WDSBasic, WDSReadableSubclass

    warnings.filterwarnings(
        "ignore",
        category=UserWarning,
        message='Field name "json" in "WDSLaion" shadows an attribute in parent "WDSBasic"',
    )

    class Laion(WDSReadableSubclass):
        """Parity: webdataset_laion.py:23-40."""

        uid: str = Field(default="")
        face_bboxes: Optional[List[List[float]]] = Field(default=None)
        caption: Optional[str] = Field(default=None)
        url: Optional[str] = Field(default=None)
        key: Optional[str] = Field(default=None)
        status: Optional[str] = Field(default=None)
        error_message: Optional[str] = Field(default=None)
        width: Optional[int] = Field(default=None)
        height: Optional[int] = Field(default=None)
        original_width: Optional[int] = Field(default=None)
        original_height: Optional[int] = Field(default=None)
        exif: Optional[str] = Field(default=None)
        sha256: Optional[str] = Field(default=None)

        @staticmethod
        def _reader(builder, item):
            return Laion.model_validate_json(builder.read_text(item))

    class WDSLaion(WDSBasic):
        """Parity: webdataset_laion.py:43-45."""

        txt: Optional[str] = Field(default=None)
        json: Laion = Field(default_factory=Laion)  # type: ignore[assignment]

    class LaionMeta(BaseModel):
        """Per-sample CLIP embedding record from the npz sidecars —
        parity webdataset_laion.py:48-55."""

        file: File
        index: Optional[int] = Field(default=None)
        b32_img: List[float] = Field(default=[])
        b32_txt: List[float] = Field(default=[])
        l14_img: List[float] = Field(default=[])
        l14_txt: List[float] = Field(default=[])
        dedup: List[float] = Field(default=[])

except ImportError:  # pragma: no cover
    Laion = WDSLaion = LaionMeta = None  # type: ignore[assignment]


def process_laion_meta(file) -> "Iterator[LaionMeta]":
    """Explode a LAION npz metadata file into one row per sample index —
    parity webdataset_laion.py:58-79. Used as
    ``chain.gen(emd=process_laion_meta)``; runs executor-side (each worker
    loads only its own npz shards)."""
    import numpy as np

    with file.open("rb") as fd_npz:
        npz_file = np.load(fd_npz)
        b32_img = npz_file["b32_img"]
        b32_txt = npz_file["b32_txt"]
        l14_img = npz_file["l14_img"]
        l14_txt = npz_file["l14_txt"]
        dedup = npz_file["dedup"]
        for index in range(len(b32_img)):
            yield LaionMeta(
                file=file,
                index=index,
                b32_img=b32_img[index].tolist(),
                b32_txt=b32_txt[index].tolist(),
                l14_img=l14_img[index].tolist(),
                l14_txt=l14_txt[index].tolist(),
                dedup=dedup[index].tolist(),
            )


if LaionMeta is not None:
    process_laion_meta.__annotations__ = {"file": File, "return": Iterator[LaionMeta]}
