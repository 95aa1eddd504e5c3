"""Camelyon16 annotation geometry.

Re-implements the reference's annotation model (reference util.py:180-347):
polygons with point-in-polygon tests, the internal JSON format, and the
official-XML -> JSON converter.  Point-in-polygon uses matplotlib.path
(skimage's ``points_in_poly`` is the same even-odd algorithm).
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET
from typing import List, Sequence, Tuple

import numpy as np
from matplotlib.path import Path


class Polygon:
    """Named polygon as an [N, 2] vertex array (x, y)."""

    def __init__(self, name: str, vertices: np.ndarray):
        self.name = name
        self.vertices = np.asarray(vertices)
        self._path = Path(self.vertices) if len(self.vertices) >= 3 else None

    def inside(self, coord: Tuple[float, float]) -> bool:
        if self._path is None:
            return False
        return bool(self._path.contains_point(coord))

    def inside_many(self, coords: np.ndarray) -> np.ndarray:
        """Vectorized point-in-polygon over an [M, 2] coord array."""
        if self._path is None:
            return np.zeros(len(coords), bool)
        return self._path.contains_points(coords)


class Annotation:
    """Positive/negative polygon sets loaded from the internal JSON format
    ({'positive': [{'name', 'vertices'}], 'negative': [...]})."""

    def __init__(self):
        self.json_path = ""
        self.polygons_positive: List[Polygon] = []
        self.polygons_negative: List[Polygon] = []

    def from_json(self, json_path: str) -> "Annotation":
        self.json_path = json_path
        with open(json_path) as f:
            doc = json.load(f)
        for key, store in (
            ("positive", self.polygons_positive),
            ("negative", self.polygons_negative),
        ):
            for ann in doc.get(key, []):
                store.append(Polygon(ann["name"], np.array(ann["vertices"])))
        return self

    def inside_polygons(self, coord, is_positive: bool) -> bool:
        polys = self.polygons_positive if is_positive else self.polygons_negative
        return any(p.inside(coord) for p in polys)

    def inside_polygons_many(self, coords: np.ndarray, is_positive: bool) -> np.ndarray:
        """Vectorized membership over [M, 2] coords — the batched variant the
        dataset label pass uses instead of the reference's per-item test."""
        polys = self.polygons_positive if is_positive else self.polygons_negative
        out = np.zeros(len(coords), bool)
        for p in polys:
            out |= p.inside_many(coords)
        return out

    def polygon_vertices(self, is_positive: bool):
        polys = self.polygons_positive if is_positive else self.polygons_negative
        return [p.vertices for p in polys]


def camelyon16xml2json(inxml: str, outjson: str) -> None:
    """Convert official Camelyon16 ASAP XML to the internal JSON format
    (groups Tumor/_0/_1 -> positive, _2 -> negative; reference
    util.py:283-330)."""
    root = ET.parse(inxml).getroot()

    def group(name: str):
        return root.findall(f'./Annotations/Annotation[@PartOfGroup="{name}"]')

    positive = group("Tumor") + group("_0") + group("_1")
    negative = group("_2")

    def vertices_of(annotation):
        xs = [float(c.get("X")) for c in annotation.findall("./Coordinates/Coordinate")]
        ys = [float(c.get("Y")) for c in annotation.findall("./Coordinates/Coordinate")]
        return np.round(np.stack([xs, ys], axis=1)).astype(int).tolist()

    doc = {
        "positive": [
            {"name": a.attrib.get("Name", f"Annotation {i}"), "vertices": vertices_of(a)}
            for i, a in enumerate(positive)
        ],
        "negative": [
            {"name": a.attrib.get("Name", f"Annotation {i}"), "vertices": vertices_of(a)}
            for i, a in enumerate(negative)
        ],
    }
    with open(outjson, "w") as f:
        json.dump(doc, f, indent=1)


def vertices2json(outjson: str, positive_vertices: Sequence = (), negative_vertices: Sequence = ()) -> None:
    """Write raw vertex arrays into the internal JSON format (reference
    util.py:332-347)."""
    doc = {
        "positive": [
            {"name": f"Annotation {i}", "vertices": np.asarray(v).astype(int).tolist()}
            for i, v in enumerate(positive_vertices)
        ],
        "negative": [
            {"name": f"Annotation {i}", "vertices": np.asarray(v).astype(int).tolist()}
            for i, v in enumerate(negative_vertices)
        ],
    }
    with open(outjson, "w") as f:
        json.dump(doc, f, indent=1)
