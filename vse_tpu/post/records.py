"""Raw OCR record model.

The reference streams OCR output through a `raw.txt` file with lines
"NNNNNNNN\t(xmin, xmax, ymin, ymax)\ttext\n" (written at reference
backend/tools/subtitle_ocr.py:64-66, parsed back at reference
backend/main.py:671-729). We keep the records in memory as dataclasses —
no file IPC in the hot path — but provide the identical line format for
debug dumps and for byte-parity testing of the post stages.
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass, replace
from typing import Iterable, List, Tuple


@dataclass
class RawRecord:
    frame_no: int
    coord: Tuple[int, int, int, int]  # (xmin, xmax, ymin, ymax)
    text: str

    def to_line(self) -> str:
        return f"{str(self.frame_no).zfill(8)}\t{self.coord}\t{self.text}\n"

    @classmethod
    def from_line(cls, line: str) -> "RawRecord":
        frame_s, coord_s, text = line.split("\t", 2)
        nums = coord_s.split("(")[1].split(")")[0].split(", ")
        return cls(
            frame_no=int(frame_s),
            coord=(int(nums[0]), int(nums[1]), int(nums[2]), int(nums[3])),
            text=text.rstrip("\n"),
        )


def write_raw(records: Iterable[RawRecord], path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for r in records:
            f.write(r.to_line())


def read_raw(path: str) -> List[RawRecord]:
    out = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            if line.strip():
                out.append(RawRecord.from_line(line))
    return out


def concat_same_frame(records: List[RawRecord]) -> List[RawRecord]:
    """Merge records sharing a frame number into one line (reference
    backend/main.py:820-864 `_concat_content_with_same_frameno`): texts join
    with spaces (embedded newlines flattened), the merged record keeps the
    first occurrence's coordinate, and text is NFKC-normalized."""
    by_frame: dict = {}
    order: List[int] = []
    for r in records:
        if r.frame_no not in by_frame:
            by_frame[r.frame_no] = []
            order.append(r.frame_no)
        by_frame[r.frame_no].append(r)
    out: List[RawRecord] = []
    for frame_no in order:
        group = by_frame[frame_no]
        if len(group) == 1:
            text = group[0].text
        else:
            text = " ".join(g.text for g in group).replace("\n", " ")
        text = unicodedata.normalize("NFKC", text)
        out.append(RawRecord(frame_no, group[0].coord, text))
    return out
