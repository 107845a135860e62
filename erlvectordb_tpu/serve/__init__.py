from erlvectordb_tpu.serve.oauth import OAuthError, OAuthServer  # noqa: F401
from erlvectordb_tpu.serve import tools  # noqa: F401
