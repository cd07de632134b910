from .services import collect_services_from_summaries, PINNED_NOW  # noqa: F401
from .assets import collect_services, collect_pods  # noqa: F401
