class InvalidGitRepositoryError(Exception):
    pass

class NoSuchPathError(Exception):
    pass

class Repo:
    def __init__(self, *a, **k):
        raise InvalidGitRepositoryError("git stub")
