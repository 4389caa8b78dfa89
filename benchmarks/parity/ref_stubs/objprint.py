"""Minimal objprint stub for running the reference without the dependency."""
def objstr(obj, **kwargs):
    return repr(obj)

def add_objprint(**kwargs):
    def decorator(cls):
        return cls
    return decorator

def op(*args, **kwargs):
    pass
