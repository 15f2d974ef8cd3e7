"""A minimal GTP-speaking Hex 'engine' used to test the MoHex plumbing
without the real binary: tracks loadsgf/play state and answers reg_genmove
with the first free cell (column-major preference, like a very lazy player).
"""
import re
import sys


def main():
    size = 11
    occupied = set()

    def reply(text=""):
        sys.stdout.write(f"= {text}\n\n" if text else "=\n\n")
        sys.stdout.flush()

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        cmd, *args = line.split()
        if cmd == "boardsize":
            size = int(args[0])
            occupied = set()
            reply()
        elif cmd == "clear_board":
            occupied = set()
            reply()
        elif cmd == "play":
            occupied.add(args[1].lower())
            reply()
        elif cmd == "loadsgf":
            with open(args[0]) as f:
                sgf = f.read()
            m = re.search(r"SZ\[(\d+)\]", sgf)
            if m:
                size = int(m.group(1))
            occupied = {p.lower() for p in re.findall(r"[BW]\[(\w+)\]", sgf)}
            reply()
        elif cmd == "reg_genmove":
            found = None
            for r in range(size):
                for c in range(size):
                    cell = f"{chr(ord('a') + c)}{r + 1}"
                    if cell not in occupied:
                        found = cell
                        break
                if found:
                    break
            reply(found or "pass")
        elif cmd == "showboard":
            reply("stub\nstub\nstub\nboard\nstub")
        elif cmd == "quit":
            reply()
            break
        else:
            reply()


if __name__ == "__main__":
    main()
