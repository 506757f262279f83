"""Segmentation result formatting and the compressed CSV writer.

Equivalent of the reference's formatSegmentationOutput/formatSegmentation
(ref: src/python/segmentation/FileIO.py:402-483) and the listener process
(ref: segment.py:75-115) — here a writer thread fed by a queue, producing
the same zstd-compressed CSV and `.errors` sidecar.
"""

from __future__ import annotations

import queue as _queue
import sys
import threading
from os.path import splitext

import numpy as np

CSV_HEADER = b"readid,signalid,start,end,basepos,base,motif,state,posterior_probability,polish\n"


def format_segments(
    segments: list,
    sig_offset: int,
    last_index: int,
    read: str,
    kmer_size: int,
    rna: bool,
) -> np.ndarray:
    """Segment tuples -> output rows [start, end, basepos, base, motif,
    state, prob, polish] (ref: FileIO.py:402-460).

    segments: [(state, basepos, start_t, prob[, polish])] in read order,
    coordinates in processing orientation. `read` is the processing-
    orientation read (RNA: 3'->5' with polyA prefix).
    """
    n = len(segments)
    rows = np.empty((n, 8), dtype=object)
    half = kmer_size // 2
    for i, seg in enumerate(segments):
        state, basepos, start_t = seg[0], seg[1], seg[2]
        prob = seg[3]
        polish = seg[4] if len(seg) > 4 else "NA"
        start = start_t + sig_offset
        if i < n - 1:
            end = segments[i + 1][2] + sig_offset
        else:
            end = last_index
        motif = read[max(0, basepos - half): min(len(read), basepos + half + 1)]
        base = read[basepos]
        if rna:
            motif = motif[::-1]
            basepos = len(read) - basepos - 1
        rows[i] = [start, end, basepos, base, motif, state, prob, polish]
    return rows


def rows_to_csv_bytes(readid: str, signalid: str, rows: np.ndarray) -> bytes:
    """(ref: FileIO.py:462-483)."""
    prefix = f"{readid},{signalid},"
    return (
        "\n".join(prefix + ",".join(map(str, row)) for row in rows) + "\n"
    ).encode("utf-8")


def format_segments_csv(
    readid: str,
    signalid: str,
    segments: list,
    sig_offset: int,
    last_index: int,
    read: str,
    kmer_size: int,
    rna: bool,
) -> bytes:
    """Fused format_segments + rows_to_csv_bytes: one pass from segment
    tuples straight to CSV bytes (byte-identical to the two-step path; the
    intermediate object-array rows cost ~5 ms per read at production N)."""
    n = len(segments)
    half = kmer_size // 2
    L = len(read)
    prefix = f"{readid},{signalid},"
    lines = []
    for i, seg in enumerate(segments):
        state, basepos, start_t, prob = seg[0], seg[1], seg[2], seg[3]
        polish = seg[4] if len(seg) > 4 else "NA"
        start = start_t + sig_offset
        end = segments[i + 1][2] + sig_offset if i < n - 1 else last_index
        lo = basepos - half
        motif = read[lo if lo > 0 else 0: basepos + half + 1]
        base = read[basepos]
        if rna:
            motif = motif[::-1]
            basepos = L - basepos - 1
        lines.append(
            f"{prefix}{start},{end},{basepos},{base},{motif},{state},"
            f"{prob},{polish}"
        )
    return ("\n".join(lines) + "\n").encode("utf-8")


class SegmentationWriter:
    """Queue-fed writer thread: zstd CSV + `.errors` sidecar
    (ref: segment.py:75-115). Error entries are strings; results bytes."""

    def __init__(self, outfile: str, queue_size: int = 1000,
                 append: bool = False):
        import zstandard as zstd

        self.outfile = outfile
        self.errfile = splitext(splitext(outfile)[0])[0] + ".errors"
        self.queue: _queue.Queue = _queue.Queue(maxsize=queue_size)
        self.num_reads = 0
        self.num_errors = 0
        self._zstd = zstd
        self._append = append  # resume: new zstd frame, no header
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        compressor = self._zstd.ZstdCompressor(level=3)
        try:
            from tqdm import tqdm

            pbar = tqdm(desc="Segmented", unit=" reads", dynamic_ncols=False,
                        mininterval=10, file=sys.stderr)  # ref: segment.py:89-95
        except ImportError:
            pbar = None
        mode = "ab" if self._append else "wb"
        with open(self.outfile, mode) as raw:
            with compressor.stream_writer(raw) as out:
                if not self._append:
                    out.write(CSV_HEADER)
                while True:
                    item = self.queue.get()
                    if item is None:
                        break
                    if isinstance(item, str):
                        with open(self.errfile, "a") as err:
                            err.write(item + "\n")
                        self.num_errors += 1
                        if pbar is not None:
                            pbar.set_postfix(errors=self.num_errors)
                    else:
                        out.write(item)
                        self.num_reads += 1
                        if pbar is not None:
                            pbar.update(1)
        if pbar is not None:
            pbar.close()

    def put_result(self, data: bytes):
        self.queue.put(data)

    def put_error(self, msg: str):
        self.queue.put(msg)

    def close(self):
        self.queue.put(None)
        self._thread.join()
        print(
            f"Reads segmented: {self.num_reads} Errors: {self.num_errors}",
            file=sys.stderr,
        )


def existing_readids(outfile: str) -> set:
    """Read ids already present in a (possibly multi-frame) zstd CSV —
    the skip set for a resumed segmentation run."""
    import zstandard as zstd

    done: set = set()
    try:
        with open(outfile, "rb") as raw:
            reader = zstd.ZstdDecompressor().stream_reader(
                raw, read_across_frames=True
            )
            buf = b""
            while True:
                chunk = reader.read(1 << 20)
                if not chunk:
                    break
                buf += chunk
                lines = buf.split(b"\n")
                buf = lines.pop()
                for line in lines:
                    i = line.find(b",")
                    if i > 0:
                        done.add(line[:i].decode())
            i = buf.find(b",")
            if i > 0:
                done.add(buf[:i].decode())
    except (OSError, zstd.ZstdError):
        return done
    done.discard("readid")
    return done
