from .base import Sha256dEngine
from .cpu import CpuSha256D
from . import registry
