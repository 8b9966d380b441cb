"""Weight/file fetch helpers — counterpart of reference utils/google_utils.py.

Reference behavior (google_utils.py:19-92): `attempt_download(file)` returns
immediately when the file exists, otherwise resolves a GitHub release asset
URL (api lookup with a hard-coded asset/tag fallback) and downloads it,
deleting partial files below a sanity size; `gdrive_download(id, file)` pulls
a Google Drive file through the confirm-token cookie flow and unzips archives.

Rebuilt on urllib (no requests/torch.hub/curl dependency) with the same
contract: local-path passthrough, partial-download cleanup, size sanity check.
Both raise a clear DownloadError when the environment has no egress instead of
silently continuing with a missing file (the reference prints and returns,
then crashes later in torch.load).
"""

from __future__ import annotations

import json
import re
import shutil
import urllib.request
import zipfile
from pathlib import Path
from typing import Optional, Sequence

DEFAULT_REPO = "chanchanchan97/ICAFusion"
# GitHub-release assets of the upstream YOLOv5 the reference falls back to
# (google_utils.py:28-30); used when the api lookup is unavailable.
FALLBACK_ASSETS = ("yolov5s.pt", "yolov5m.pt", "yolov5l.pt", "yolov5x.pt",
                   "yolov5s6.pt", "yolov5m6.pt", "yolov5l6.pt", "yolov5x6.pt")
FALLBACK_TAG = "v5.0"
FALLBACK_REPO = "ultralytics/yolov5"


class DownloadError(RuntimeError):
    pass


def _urlopen(url: str, timeout: float = 30.0, opener=None):
    req = urllib.request.Request(url, headers={"User-Agent": "icafusion-tpu"})
    if opener is not None:
        return opener.open(req, timeout=timeout)
    return urllib.request.urlopen(req, timeout=timeout)


def safe_download(url: str, file, min_bytes: float = 1e6, opener=None) -> Path:
    """Stream url -> file; delete the partial file and raise on failure or if
    the result is smaller than min_bytes (google_utils.py:46-54 semantics).
    opener: optional urllib opener (e.g. cookie-carrying, for Drive's
    confirm-token flow)."""
    file = Path(file)
    file.parent.mkdir(parents=True, exist_ok=True)
    try:
        with _urlopen(url, opener=opener) as r, open(file, "wb") as f:
            shutil.copyfileobj(r, f)
    except Exception as e:
        file.unlink(missing_ok=True)
        raise DownloadError(f"download failed: {url} -> {file}: {e}") from e
    if file.stat().st_size < min_bytes:
        file.unlink(missing_ok=True)
        raise DownloadError(f"download too small (<{min_bytes:g}B): {url}")
    return file


def github_release_url(name: str, repo: str = FALLBACK_REPO,
                       tag: Optional[str] = None,
                       assets: Optional[Sequence[str]] = None) -> Optional[str]:
    """Resolve a release-asset URL. Tries the GitHub api for the latest tag +
    asset list (google_utils.py:24-27); falls back to the known asset table."""
    if tag is None or assets is None:
        try:
            with _urlopen(f"https://api.github.com/repos/{repo}/releases/latest",
                          timeout=10) as r:
                data = json.load(r)
            assets = assets or [a["name"] for a in data.get("assets", [])]
            tag = tag or data.get("tag_name")
        except Exception:
            assets = assets or FALLBACK_ASSETS
            tag = tag or FALLBACK_TAG
    if name not in assets:
        return None
    return f"https://github.com/{repo}/releases/download/{tag}/{name}"


def attempt_download(file, repo: str = FALLBACK_REPO,
                     min_bytes: float = 1e6) -> Path:
    """Return `file` if it exists locally; otherwise try to fetch it as a
    GitHub release asset (google_utils.py:19-56). Raises DownloadError with
    the manual-download URL when fetching is impossible (e.g. no egress)."""
    file = Path(str(file).strip().replace("'", ""))
    if file.exists():
        return file
    url = github_release_url(file.name, repo=repo)
    if url is None:
        raise DownloadError(
            f"{file} missing and '{file.name}' is not a known release asset "
            f"of {repo}; download it manually")
    try:
        return safe_download(url, file, min_bytes=min_bytes)
    except DownloadError as e:
        raise DownloadError(
            f"{file} missing; automatic fetch failed ({e}). Download it "
            f"manually from https://github.com/{repo}/releases/") from e


_GDRIVE_TOKEN_RE = re.compile(r"confirm=([0-9A-Za-z_\-]+)")


def gdrive_download(file_id: str, file="tmp.zip", unzip: bool = True) -> Path:
    """Google Drive fetch with the large-file confirm-token flow
    (google_utils.py:59-92); unzips .zip archives next to the file.

    The confirm token Drive hands out in the probe response is tied to its
    download_warning session cookie (the reference threads it through curl's
    -c/-b cookie jar), so BOTH requests go through one cookie-carrying
    opener — a fresh opener on the confirmed request would be ignored."""
    import http.cookiejar

    file = Path(file)
    file.unlink(missing_ok=True)
    base = f"https://drive.google.com/uc?export=download&id={file_id}"
    opener = urllib.request.build_opener(
        urllib.request.HTTPCookieProcessor(http.cookiejar.CookieJar()))
    try:
        with _urlopen(base, opener=opener) as r:
            head = r.read(65536)
        m = _GDRIVE_TOKEN_RE.search(head.decode("utf-8", "replace"))
        token = m.group(1) if m else None
        if token is None:
            # token may arrive as a cookie (download_warning_<id>=<token>)
            for handler in opener.handlers:
                jar = getattr(handler, "cookiejar", None)
                for c in jar or ():
                    if c.name.startswith("download_warning"):
                        token = c.value
        url = f"{base}&confirm={token}" if token else base
        safe_download(url, file, min_bytes=1, opener=opener)
    except DownloadError:
        raise
    except Exception as e:
        file.unlink(missing_ok=True)
        raise DownloadError(f"gdrive download failed: {file_id}: {e}") from e
    if unzip and file.suffix == ".zip":
        with zipfile.ZipFile(file) as z:
            z.extractall(file.parent)
        file.unlink()
    return file
