"""S2: binary-document conversion source (PDF/DOCX/PPTX -> text).

The reference converts binary documents with docling
(/root/reference/ontocast/tool/converter.py:42-58: DocumentConverter
-> markdown export) before chunking. docling is not available in this
environment, so — exactly like the media codec boundary in
operators/multimodal.py — the Spark-side plumbing is real and tested
(distributed ``binaryFile`` source, Arrow-batched ``mapInPandas`` with
a batch re-chunk so large blobs can't blow executor memory, typed
output schema feeding straight into the pipeline's ``documents``
shape) while the codec itself is pluggable: plain text/markdown/JSON
payloads decode for real, and binary formats route through the
optional-dependency hook (:func:`active_converter` — an explicitly
registered codec, else auto-detected docling, else a clearly-marked
``NotImplementedError`` boundary).

Scale notes: ``binaryFile`` gives one task per file (no driver-side
reads); conversion is CPU-bound per document and embarrassingly
parallel, so it scales with executors; the 2 GB java byte-array limit
per file is inherited from the source (split giant archives upstream).
"""

from __future__ import annotations

import importlib.util
import json
import os
import re
import zlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CONVERTED_DOCS = "doc_path string, fmt string, n_bytes long, text string"

_TEXT_FORMATS = {".txt", ".md", ".markdown"}
_BINARY_FORMATS = {".pdf", ".docx", ".pptx", ".html"}

# --- optional-dependency codec hook -----------------------------------
_registered_converter: Callable | None = None
_worker_docling = None  # lazy per-worker docling instance


def register_converter(fn: Callable | None) -> None:
    """Plug a binary codec globally: ``fn(ext, raw_bytes) -> text``.
    Takes precedence over auto-detection; pass ``None`` to clear. The
    callable is captured on the driver at plan-build time and shipped
    to executors inside the mapInPandas closure (cloudpickle), so it
    must be serializable."""
    global _registered_converter
    _registered_converter = fn


def _docling_convert(ext: str, raw: bytes) -> str:
    """The reference's converter (tool/converter.py:42-58: docling
    DocumentConverter -> markdown export), initialized lazily ONCE per
    Python worker — the instance is heavyweight and unpicklable, so it
    must never ride in the closure."""
    global _worker_docling
    if _worker_docling is None:
        from docling.document_converter import DocumentConverter

        _worker_docling = DocumentConverter()
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=ext or ".bin") as f:
        f.write(raw)
        f.flush()
        return _worker_docling.convert(f.name).document.export_to_markdown()


def active_converter() -> Callable | None:
    """Codec resolution order: explicitly registered codec, then
    auto-detected docling (activates the real PDF/DOCX/PPTX decode the
    moment the library is installed — find_spec only, no import cost
    when absent), else ``None`` (the honest stub: binary formats raise
    NotImplementedError)."""
    if _registered_converter is not None:
        return _registered_converter
    if importlib.util.find_spec("docling") is not None:
        return _docling_convert
    return None


# --- minimal stdlib PDF text extraction --------------------------------
# The honest-stub boundary for S2 used to cover ALL binary formats; PDFs
# with plain (uncompressed or Flate-compressed) text content streams are
# decodable with the stdlib alone, so that subset now decodes for real
# (reference behavior: tool/converter.py:42-58 via docling). Registered
# codecs and docling still take precedence; PDFs whose content streams
# carry no text operators (scanned pages, CID-encoded fonts,
# encryption) and text-free DOCX/PPTX packages keep the
# NotImplementedError boundary — see the office-XML section below for
# the stdlib DOCX/PPTX path.

_PDF_STREAM_RE = re.compile(rb"stream\r?\n")
_PDF_TEXT_OP_RE = re.compile(
    r"\(((?:\\.|[^\\()])*)\)\s*Tj"          # (string) Tj
    r"|\[((?:\\.|[^\\\]])*)\]\s*TJ"          # [(s1) -kern (s2)] TJ
    r"|<([0-9A-Fa-f\s]+)>\s*Tj"              # <hex> Tj
)
_PDF_STR_RE = re.compile(r"\(((?:\\.|[^\\()])*)\)")
_PDF_ESCAPES = {
    "n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
    "(": "(", ")": ")", "\\": "\\",
}


def _pdf_unescape(s: str) -> str:
    # PDF spec 7.3.4.2: only \ddd with OCTAL digits is a code escape; a
    # backslash before any other char (incl. '8', '9', or a non-ASCII
    # Unicode digit, which str.isdigit() would accept but int(_, 8)
    # rejects) just yields that char — so gate on the regex alternative
    # that matched, not on isdigit().
    def sub(m: re.Match) -> str:
        if m.group("oct") is not None:
            return chr(int(m.group("oct"), 8) & 0xFF)
        body = m.group("ch")
        return _PDF_ESCAPES.get(body, body)

    return re.sub(r"\\(?:(?P<oct>[0-7]{1,3})|(?P<ch>.))", sub, s)


def _pdf_content_streams(raw: bytes) -> list[bytes]:
    """Every stream body, Flate-decompressed when its object dict says
    so (filter detected by scanning back to the enclosing ``obj`` —
    object dicts nest, so a bracket parse is not needed for this)."""
    out = []
    for m in _PDF_STREAM_RE.finditer(raw):
        end = raw.find(b"endstream", m.end())
        if end < 0:
            continue
        body = raw[m.end():end]
        # strip AT MOST one EOL before 'endstream' (the spec's optional
        # separator) — rstripping all 0x0A/0x0D bytes can eat real
        # Flate data/checksum bytes that legitimately end in them
        if body.endswith(b"\r\n"):
            body = body[:-2]
        elif body.endswith((b"\n", b"\r")):
            body = body[:-1]
        head_start = raw.rfind(b"obj", 0, m.start())
        head = raw[max(head_start, 0):m.start()]
        if b"/FlateDecode" in head:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue
        out.append(body)
    return out


def minimal_pdf_text(raw: bytes) -> str:
    """Extract the text-showing operators (``Tj`` / ``TJ``, literal and
    hex strings, escape + octal sequences) from a PDF's content
    streams — the uncompressed/Flate subset a generated or simple
    text PDF uses. One output line per show-text operator. Raises
    ``NotImplementedError`` when no text operator decodes (scanned or
    CID-encoded documents need a real codec)."""
    if not raw.startswith(b"%PDF"):
        raise NotImplementedError("not a PDF payload")
    lines: list[str] = []
    for stream in _pdf_content_streams(raw):
        content = stream.decode("latin-1", errors="replace")
        for m in _PDF_TEXT_OP_RE.finditer(content):
            lit, arr, hexs = m.group(1), m.group(2), m.group(3)
            if lit is not None:
                lines.append(_pdf_unescape(lit))
            elif arr is not None:
                parts = [_pdf_unescape(x.group(1))
                         for x in _PDF_STR_RE.finditer(arr)]
                lines.append("".join(parts))
            else:
                digits = re.sub(r"\s", "", hexs)
                if len(digits) % 2:
                    digits += "0"
                decoded = bytes.fromhex(digits).decode("latin-1")
                # NUL bytes mean a 2-byte CID encoding (Identity-H) —
                # latin-1 would yield interleaved mojibake; skip the
                # operator so an all-CID document hits the honest
                # NotImplementedError boundary instead of emitting junk
                if "\x00" in decoded:
                    continue
                lines.append(decoded)
    if not lines:
        raise NotImplementedError(
            "PDF carries no decodable text operators (scanned/CID/"
            "encrypted documents need a registered codec or docling)"
        )
    return "\n".join(lines)


# --- minimal stdlib DOCX / PPTX text extraction ------------------------
# Both formats are zipped XML (OPC packages), so the text subset is
# decodable with zipfile + ElementTree alone — the office twin of
# minimal_pdf_text above (reference behavior tool/converter.py:42-58
# via docling). Embedded images, charts, headers/footers and revision
# markup are out of scope; a package whose XML carries no text nodes
# keeps the honest NotImplementedError boundary.

_SLIDE_NUM_RE = re.compile(r"ppt/slides/slide(\d+)\.xml$")


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _docx_paragraph_text(par) -> str:
    """One WordprocessingML <w:p>: concatenate <w:t> runs, mapping
    <w:tab/> to a tab and <w:br/>/<w:cr/> to a newline (ECMA-376
    §17.3.3)."""
    parts: list[str] = []
    for node in par.iter():
        ln = _localname(node.tag)
        if ln == "t" and node.text:
            parts.append(node.text)
        elif ln == "tab":
            parts.append("\t")
        elif ln in ("br", "cr"):
            parts.append("\n")
    return "".join(parts)


def _opc_xml(raw: bytes, member: str):
    """Open an OPC (zip) package member as an ElementTree root."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    try:
        zf = zipfile.ZipFile(io.BytesIO(raw))
    except zipfile.BadZipFile as e:
        raise NotImplementedError(f"not an OPC (zip) package: {e}") from e
    with zf:
        try:
            data = zf.read(member)
        except KeyError as e:
            raise NotImplementedError(
                f"OPC package has no {member} part"
            ) from e
        try:
            return ET.fromstring(data)
        except ET.ParseError as e:
            raise NotImplementedError(
                f"malformed XML in {member}: {e}"
            ) from e


def minimal_docx_text(raw: bytes) -> str:
    """Extract paragraph text from a .docx package's
    ``word/document.xml`` — one output line per <w:p> (table-cell
    paragraphs included: they are plain <w:p> elements in document
    order). Raises ``NotImplementedError`` when the package carries no
    text nodes."""
    root = _opc_xml(raw, "word/document.xml")
    lines = [
        _docx_paragraph_text(p) for p in root.iter()
        if _localname(p.tag) == "p"
    ]
    if not any(ln.strip() for ln in lines):
        raise NotImplementedError(
            "DOCX carries no text nodes (drawing-only or non-standard "
            "documents need a registered codec or docling)"
        )
    return "\n".join(lines)


def minimal_pptx_text(raw: bytes) -> str:
    """Extract slide text from a .pptx package: slides in numeric
    order (``ppt/slides/slide<N>.xml``), one output line per DrawingML
    paragraph <a:p> (titles, body placeholders, and table cells all
    reduce to <a:t> runs inside <a:p>). Raises ``NotImplementedError``
    when no slide carries text."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    try:
        zf = zipfile.ZipFile(io.BytesIO(raw))
    except zipfile.BadZipFile as e:
        raise NotImplementedError(f"not an OPC (zip) package: {e}") from e
    with zf:
        slides = sorted(
            (int(m.group(1)), name)
            for name in zf.namelist()
            if (m := _SLIDE_NUM_RE.fullmatch(name))
        )
        if not slides:
            raise NotImplementedError("PPTX package has no slide parts")
        lines: list[str] = []
        for _, name in slides:
            try:
                root = ET.fromstring(zf.read(name))
            except ET.ParseError as e:
                raise NotImplementedError(
                    f"malformed XML in {name}: {e}"
                ) from e
            for p in root.iter():
                if _localname(p.tag) != "p":
                    continue
                text = "".join(
                    node.text for node in p.iter()
                    if _localname(node.tag) == "t" and node.text
                )
                lines.append(text)
    if not any(ln.strip() for ln in lines):
        raise NotImplementedError(
            "PPTX carries no text nodes (image-only decks need a "
            "registered codec or docling)"
        )
    return "\n".join(lines)


def read_binary_documents(spark: SparkSession, path: str) -> DataFrame:
    """Distributed binary-document scan: (path, length, content)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*")
        .load(path)
        .select(
            F.col("path").alias("doc_path"),
            F.col("length").alias("n_bytes"),
            F.col("content").alias("payload"),
        )
    )


def _decode_payload(
    doc_path: str, payload: bytes, converter: Callable | None
) -> tuple[str, str]:
    """Returns (fmt, text). The docling boundary lives here."""
    ext = os.path.splitext(doc_path)[1].lower()
    raw = bytes(payload) if payload is not None else b""
    if ext == ".json":
        # the reference's {"text": ...} payload (convert_document.py:48-53)
        return "json", json.loads(raw.decode("utf-8")).get("text", "")
    if ext in _TEXT_FORMATS:
        return ext.lstrip("."), raw.decode("utf-8", errors="replace")
    if converter is not None:
        return ext.lstrip("."), converter(ext, raw)
    if ext == ".pdf":
        # stdlib fallback for the plain-text-stream PDF subset; raises
        # NotImplementedError itself for PDFs it cannot honestly decode
        return "pdf", minimal_pdf_text(raw)
    if ext == ".docx":
        return "docx", minimal_docx_text(raw)
    if ext == ".pptx":
        return "pptx", minimal_pptx_text(raw)
    raise NotImplementedError(
        f"binary document conversion for {ext!r} requires a converter "
        "(the reference uses docling, unavailable here); pass "
        "convert_documents(..., converter=fn) with fn(ext, bytes) -> str "
        "and keep the same batch contract"
    )


def convert_documents(
    binary_docs: DataFrame,
    converter: Callable | None = None,
    batch_limit: int = 64,
) -> DataFrame:
    """(doc_path, n_bytes, payload) -> (doc_path, fmt, n_bytes, text)
    via mapInPandas. ``batch_limit`` re-chunks Arrow batches so a batch
    of large binaries cannot blow executor memory. ``converter=None``
    resolves through :func:`active_converter` (registered codec, then
    auto-detected docling, then the honest stub)."""
    if converter is None:
        converter = active_converter()

    def convert_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                part = pdf.iloc[start : start + batch_limit]
                fmts, texts = [], []
                for doc_path, payload in zip(part["doc_path"], part["payload"]):
                    fmt, text = _decode_payload(doc_path, payload, converter)
                    fmts.append(fmt)
                    texts.append(text)
                yield pd.DataFrame(
                    {
                        "doc_path": part["doc_path"].tolist(),
                        "fmt": fmts,
                        "n_bytes": part["n_bytes"].tolist(),
                        "text": texts,
                    }
                )

    return binary_docs.select("doc_path", "n_bytes", "payload").mapInPandas(
        convert_batches, schema=CONVERTED_DOCS
    )


def converted_to_conversations(converted: DataFrame) -> DataFrame:
    """Adapt converted documents to the pipeline's transcript input
    shape (one single-turn conversation per document — the reference's
    one-file-one-document ingest)."""
    return converted.select(
        F.col("doc_path").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("document").alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
