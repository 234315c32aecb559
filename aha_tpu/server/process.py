"""Service process management: PID files + discovery.

Equivalent of src/server/process.rs: PID files `<port>.pid` under
$XDG_RUNTIME_DIR/aha or ~/.aha/run (:45-70); `find_aha_services` scans PID
files first (removing stale ones), then all processes whose command line
contains "aha serv"/"aha cli" (:138-218).
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path

import psutil


@dataclasses.dataclass
class ServiceInfo:
    service_id: str
    pid: int
    model: str | None
    port: int
    address: str = "127.0.0.1"
    status: str = "running"


def get_pid_dir() -> Path:
    runtime_dir = os.environ.get("XDG_RUNTIME_DIR")
    if runtime_dir:
        d = Path(runtime_dir) / "aha"
    else:
        d = Path(os.path.expanduser("~")) / ".aha" / "run"
    d.mkdir(parents=True, exist_ok=True)
    return d


def create_pid_file(pid: int, port: int) -> None:
    (get_pid_dir() / f"{port}.pid").write_text(f"{pid}\n")


def cleanup_pid_file(port: int) -> None:
    p = get_pid_dir() / f"{port}.pid"
    if p.exists():
        p.unlink()


def _cmdline(proc: psutil.Process) -> str:
    try:
        return " ".join(proc.cmdline())
    except (psutil.NoSuchProcess, psutil.AccessDenied, psutil.ZombieProcess):
        return ""


_AHA_MARKERS = ("aha serv", "aha cli", "aha_tpu serv", "aha_tpu cli")


def _is_aha_cmdline(cmd: str) -> bool:
    return any(m in cmd for m in _AHA_MARKERS)


def is_aha_process(pid: int) -> bool:
    try:
        cmd = _cmdline(psutil.Process(pid))
    except psutil.NoSuchProcess:
        return False
    return _is_aha_cmdline(cmd)


def find_aha_services() -> list[ServiceInfo]:
    services: list[ServiceInfo] = []
    pid_dir = get_pid_dir()
    for path in sorted(pid_dir.glob("*.pid")):
        try:
            port = int(path.stem)
        except ValueError:
            continue
        if port == 0:
            continue
        try:
            pid = int(path.read_text().strip())
        except (ValueError, OSError):
            continue
        if is_aha_process(pid):
            services.append(ServiceInfo(
                service_id=f"{pid}@{port}", pid=pid, model=None, port=port))
        else:
            # stale PID file (process.rs:174-177)
            try:
                path.unlink()
            except OSError:
                pass

    known = {s.pid for s in services}
    for proc in psutil.process_iter():
        if proc.pid in known:
            continue
        cmd = _cmdline(proc)
        if _is_aha_cmdline(cmd):
            services.append(ServiceInfo(
                service_id=f"{proc.pid}@0", pid=proc.pid, model=None, port=0))
    return services
