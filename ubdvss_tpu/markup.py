"""Dataset markup readers — image paths + ground-truth polygons/types.

Mirrors the reference's ``semantic_segmentation/markup_readers.py``
(SURVEY.md §1 L2, §2a "Markup readers"): per-dataset reader classes that
return, per image, a list of barcode polygons with their type labels, plus a
reader registry/factory.  "Same markup formats" is a parity requirement
(BASELINE.json north_star) — but the reference mount was empty (SURVEY.md
§0), so the concrete on-disk formats are defined here and documented:

  * JSON ("zvz-json"): one ``markup.json`` per dataset root:
      {"image.png": [{"type": "QRCode",
                      "points": [[x, y], ...]}, ...], ...}
  * XML ("zvz-xml"): per-image sidecar ``<image>.xml``:
      <image name="image.png">
        <barcode type="QRCode"><point x="1" y="2"/>...</barcode>
      </image>
  * Synthetic ("synthetic"): procedurally generated barcode-like scenes
    (ubdvss_tpu.synthetic), used for tests/benchmarks/integration — the
    stand-in for the unavailable ZVZ data.

If the real reference formats surface, add a reader class + registry entry;
everything downstream consumes only the ``Sample`` interface.
"""

from __future__ import annotations

import dataclasses
import json
import os
import xml.etree.ElementTree as ET
from pathlib import Path

import numpy as np


@dataclasses.dataclass
class BarcodeObject:
    """One ground-truth barcode: polygon in input-image coords + type."""

    points: np.ndarray  # (N, 2) float32, (x, y)
    type_name: str


@dataclasses.dataclass
class Sample:
    image_path: str
    objects: list[BarcodeObject]
    # in-memory image (synthetic datasets); loaded from image_path when None
    image: np.ndarray | None = None

    @property
    def polygons(self) -> list[np.ndarray]:
        return [o.points for o in self.objects]

    @property
    def types(self) -> list[str]:
        return [o.type_name for o in self.objects]


class MarkupReader:
    """Base reader interface (SURVEY.md §1 L2)."""

    def samples(self) -> list[Sample]:
        raise NotImplementedError

    def __len__(self) -> int:
        return len(self.samples())


class JsonMarkupReader(MarkupReader):
    """``markup.json`` at the dataset root; image paths relative to root."""

    def __init__(self, root: str | Path, markup_name: str = "markup.json"):
        self.root = Path(root)
        with open(self.root / markup_name) as f:
            raw = json.load(f)
        self._samples = [
            Sample(
                image_path=str(self.root / name),
                objects=[
                    BarcodeObject(
                        points=np.asarray(o["points"], np.float32),
                        type_name=o["type"],
                    )
                    for o in objs
                ],
            )
            for name, objs in sorted(raw.items())
        ]

    def samples(self) -> list[Sample]:
        return self._samples


class XmlMarkupReader(MarkupReader):
    """Per-image ``<stem>.xml`` sidecar files next to the images."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self._samples = []
        for xml_path in sorted(self.root.glob("**/*.xml")):
            tree = ET.parse(xml_path)
            img_el = tree.getroot()
            name = img_el.get("name")
            objs = []
            for bc in img_el.findall("barcode"):
                pts = np.asarray(
                    [
                        [float(p.get("x")), float(p.get("y"))]
                        for p in bc.findall("point")
                    ],
                    np.float32,
                )
                objs.append(BarcodeObject(points=pts, type_name=bc.get("type")))
            self._samples.append(
                Sample(image_path=str(xml_path.parent / name), objects=objs)
            )

    def samples(self) -> list[Sample]:
        return self._samples


_READERS: dict[str, type] = {
    "zvz-json": JsonMarkupReader,
    "zvz-xml": XmlMarkupReader,
}


def register_reader(name: str, cls: type) -> None:
    _READERS[name] = cls


def get_markup_reader(format_name: str, root: str | Path, **kw) -> MarkupReader:
    """Reader factory mirroring the reference's registry (SURVEY.md §2a)."""
    if format_name == "synthetic":
        from ubdvss_tpu.synthetic import SyntheticMarkupReader

        return SyntheticMarkupReader(root, **kw)
    try:
        cls = _READERS[format_name]
    except KeyError:
        raise ValueError(
            f"unknown markup format {format_name!r}; known: "
            f"{sorted(_READERS) + ['synthetic']}"
        ) from None
    return cls(root, **kw)


def write_json_markup(root: str | Path, markup: dict, name: str = "markup.json"):
    """Helper used by the synthetic generator and tests."""
    with open(Path(root) / name, "w") as f:
        json.dump(markup, f)
