/* Fast-path streaming HTML -> text extractor (CPython extension).
 *
 * Single pass over the UTF-8 bytes of a document, mirroring the exact
 * text() semantics of the pure-Python kernel (kernel/tokenizer.py,
 * kernel/treebuilder.py, kernel/arena.py node_text) for the common
 * subset of HTML: it maintains the open-element stack and the active
 * formatting list exactly like the tree builder, and BAILS OUT
 * (returns None -> caller falls back to the Python kernel) on any
 * construct that can move text nodes out of source order or change
 * preserve-whitespace ancestry in ways this pass does not model:
 * frameset, plaintext, real adoption-agency runs (formatting end tag
 * with a special element above it on the stack), Noah's-ark
 * evictions, NUL bytes, and pathological depth.  Tables (including
 * FOSTER PARENTING: non-table content re-homed before the table) and
 * select are modeled natively; fostering under an active #id scope
 * falls back (offset bookkeeping not worth the rarity).
 *
 * The contract is byte-identity with Arena.node_text(0) +
 * first-title capture of the Python kernel on every accepted
 * document (enforced by tests/test_fastpath.py differential tests).
 *
 * Reference semantics mirrored (for parity spot-checks):
 *   /root/reference/Sources/Tokeniser.swift:378-400 (Data fast loop)
 *   /root/reference/Sources/HtmlTreeBuilderState.swift (InBody rules)
 *   /root/reference/Sources/Element.swift:1705-1875 (text())
 *   /root/reference/Sources/StringUtil.swift:465-580 (ws normalize)
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stddef.h>
#include <string.h>
#include <stdint.h>

/* ---- flag bits: MUST match kernel/fastpath.py ---- */
#define F_BLOCK      (1u<<0)
#define F_PRESERVE   (1u<<1)
#define F_VOID       (1u<<2)
#define F_SPECIAL    (1u<<3)
#define F_BAIL       (1u<<4)
#define F_PCLOSER    (1u<<5)
#define F_HEADING    (1u<<6)
#define F_DDDT       (1u<<7)
#define F_FORMATTER  (1u<<8)
#define F_APPLET     (1u<<9)
#define F_EMPTYFMT   (1u<<10)
#define F_MEDIA      (1u<<11)
#define F_TOHEAD     (1u<<12)
#define F_ENDCLOSER  (1u<<13)
#define F_SCOPEBASE  (1u<<14)
#define F_IMPLIED    (1u<<15)
#define F_LIBREAK    (1u<<16)
#define F_DROP       (1u<<17)
#define F_LISTEXTRA  (1u<<18)
#define F_AHTOHEAD   (1u<<19)  /* after-head re-enter-head set */

#define MAXSTACK 256
#define MAXFMT   64
#define MAXUNK   64
#define MAXTAGLEN 63
#define UNK_BASE 4096
#define MAXTBL   16    /* open-table nesting for foster bookkeeping */

/* segment-head join state (see seg_note / fz_end) */
enum { SJ_NONE = 0, SJ_SPACE, SJ_SUPP, SJ_RAW };

/* ---- global registry (built once by init_tables) ---- */
typedef struct { const char *name; int len; int id; } TagSlot;

static TagSlot  g_tags[2048];          /* open addressing, pow2 */
static char    *g_name_arena = NULL;
static int      g_ready = 0;
static uint32_t g_flags_by_id[UNK_BASE];
static int      g_nknown = 0;

/* entity tables */
typedef struct { const char *name; int nlen; const char *val; int vlen; } EntSlot;
static EntSlot g_semi[8192];           /* mask 8191 */
static EntSlot g_nosemi[512];          /* mask 511 */
static char   *g_ent_arena = NULL;
static int     g_max_ent_name = 32;

/* well-known tag ids, resolved at init */
static int T_table, T_caption, T_colgroup, T_col, T_tbody, T_thead,
    T_tfoot, T_tr, T_td, T_th, T_select, T_keygen;
static int T_p, T_li, T_br, T_a, T_form, T_head, T_body, T_html, T_title,
    T_textarea, T_script, T_style, T_noscript, T_noframes, T_pre, T_listing,
    T_xmp, T_iframe, T_noembed, T_button, T_option, T_optgroup, T_ruby,
    T_rp, T_rt, T_nobr, T_img, T_image, T_input, T_hr, T_dd, T_dt,
    T_base, T_basefont, T_bgsound, T_command, T_link, T_meta, T_ol, T_ul;

static uint32_t fnv1a(const uint8_t *s, Py_ssize_t len) {
    uint32_t h = 2166136261u;
    for (Py_ssize_t i = 0; i < len; i++) { h ^= s[i]; h *= 16777619u; }
    return h;
}

static int tag_lookup(const uint8_t *name, int len) {
    uint32_t h = fnv1a(name, len) & 2047;
    while (g_tags[h].name) {
        if (g_tags[h].len == len && memcmp(g_tags[h].name, name, len) == 0)
            return g_tags[h].id;
        h = (h + 1) & 2047;
    }
    return -1;
}

static uint32_t tflags(int id) {
    return (id >= 0 && id < UNK_BASE) ? g_flags_by_id[id] : 0;
}

static const char *ent_lookup(EntSlot *tab, int mask, const uint8_t *n,
                              int len, int *vlen) {
    uint32_t h = fnv1a(n, len) & mask;
    while (tab[h].name) {
        if (tab[h].nlen == len && memcmp(tab[h].name, n, len) == 0) {
            *vlen = tab[h].vlen;
            return tab[h].val;
        }
        h = (h + 1) & mask;
    }
    return NULL;
}

/* ---- per-document parse state ---- */
typedef struct {
    const uint8_t *s; Py_ssize_t n, pos;
    uint8_t *out; Py_ssize_t olen;
    int32_t st_tag[MAXSTACK]; uint32_t st_ser[MAXSTACK];
    int32_t st_ptag[MAXSTACK];   /* tag of TREE parent at insert */
    int sp;
    int32_t f_tag[MAXFMT]; uint32_t f_ser[MAXFMT]; uint8_t f_mark[MAXFMT];
    uint8_t f_attr[MAXFMT];
    uint32_t f_ahash[MAXFMT];      /* raw attr-span hash (Noah's ark) */
    uint32_t cur_ahash;            /* current token's attr-span hash */
    int fp;
    uint32_t serial;
    int mode;
    int have_html, have_form, head_present;
    uint32_t head_ser, form_ser;
    Py_ssize_t title_a, title_b; int title_set; /* raw rcdata span */
    int bail;
    int pending_end;   /* queued synthetic end tag (-1 none) */
    /* #id scope extraction (css_scope fast path) */
    const uint8_t *scope_id; int scope_id_len;   /* NULL = whole doc */
    int scope_done, scope_active;
    uint32_t scope_ser;
    Py_ssize_t scope_a, scope_b;
    Py_ssize_t base_olen;          /* accumulator barrier at scope entry */
    Py_ssize_t pid_a, pid_b;       /* current token's id-attr value span */
    int pid_valid;
    /* table machinery */
    int quirks;                    /* 1 = force-quirks doctype seen */
    int seen_content, seen_doctype;
    int orig_mode;                 /* mode to restore after table text */
    Py_ssize_t pend_tx[32][2];     /* pending table-text spans */
    uint8_t pend_decode[32];
    int n_pend;
    /* foster parenting: per-open-table "foster zone" bookkeeping.
     * tb_fpt[k] = out offset where content fostered before table k
     * inserts (the zone END; the table's own emitted segment follows).
     * Emission is redirected there by fz_begin/fz_end (memmove of the
     * segment tail per rare foster event). */
    Py_ssize_t tb_fpt[MAXTBL];
    int tb_spidx[MAXTBL];          /* stack index of the table */
    uint32_t tb_ser[MAXTBL];       /* its serial (lazy tb_sync checks) */
    uint8_t tb_sj[MAXTBL];         /* segment-head join state (SJ_*) */
    int n_tbl;
    int foster_arm;                /* _in_table_anything_else armed */
    Py_ssize_t foster_copied;      /* fz tail bytes copied (quad guard) */
    int fz_brk;                    /* inside a foster-redirect bracket */
    Py_ssize_t fz_sav_fpt, fz_taillen;
    uint8_t st_fz[MAXSTACK];       /* stack entry lives in a foster zone */
    Py_ssize_t st_oout[MAXSTACK];  /* olen at push (AAA join check) */
    char unk_names[MAXUNK][MAXTAGLEN + 1];      /* doc-local interning */
    int unk_len[MAXUNK]; int n_unk;
    /* fields below unk_names are NOT zeroed per-doc by batch_extract */
    uint8_t *scratch;              /* fz tail save (persists across docs) */
    Py_ssize_t scratch_cap;
    Py_ssize_t out_cap;            /* capacity of out (set per doc) */
} P;

enum { M_PRE, M_HEAD, M_HEADNS, M_AFTERHEAD, M_BODY,
       M_TABLE, M_CAPTION, M_COLGROUP, M_TBODY, M_ROW, M_CELL,
       M_SELECT, M_SELECT_TB };

#define BAIL(p) do { (p)->bail = 1; return; } while (0)
#define BAILV(p, v) do { (p)->bail = 1; return (v); } while (0)

static int intern_tag(P *p, const uint8_t *name, int len) {
    int id = tag_lookup(name, len);
    if (id >= 0) return id;
    for (int i = 0; i < p->n_unk; i++)
        if (p->unk_len[i] == len && memcmp(p->unk_names[i], name, len) == 0)
            return UNK_BASE + i;
    if (p->n_unk >= MAXUNK || len > MAXTAGLEN) { p->bail = 1; return -1; }
    memcpy(p->unk_names[p->n_unk], name, len);
    p->unk_len[p->n_unk] = len;
    return UNK_BASE + p->n_unk++;
}

/* ---- output helpers ---- */
static inline int out_nonempty(P *p) { return p->olen > p->base_olen; }
static inline int out_lastspace(P *p) {
    return p->olen > p->base_olen && p->out[p->olen - 1] == ' ';
}
static inline void putb(P *p, uint8_t c) { p->out[p->olen++] = c; }

/* ---- foster-parenting machinery ------------------------------------- */

static inline int is_tableish(int tag) {
    return tag == T_table || tag == T_tbody || tag == T_thead ||
           tag == T_tfoot || tag == T_tr;
}

/* drop foster levels whose table has left the open-element stack.
 * Mid-stack removals (form end, a-in-a remnant) shift indices, so a
 * stale index is revalidated by the table's SERIAL before dropping. */
static int on_stack_ser(P *p, uint32_t ser);   /* fwd */
static void tb_sync(P *p) {
    while (p->n_tbl > 0) {
        int k = p->n_tbl - 1, i = p->tb_spidx[k];
        if (i < p->sp && p->st_ser[i] == p->tb_ser[k] &&
            p->st_tag[i] == T_table)
            break;
        int j = on_stack_ser(p, p->tb_ser[k]);
        if (j >= 0 && p->st_tag[j] == T_table) { p->tb_spidx[k] = j; break; }
        p->n_tbl--;
    }
}

/* Record how the innermost table segment's FIRST emission related to
 * the output preceding it, so a later foster insertion between them can
 * repair the join (fz_end):
 *   SJ_SPACE - first byte is an emitted block/ws join space
 *   SJ_SUPP  - a join was suppressed (output empty / ended in space)
 *   SJ_RAW   - first byte is plain content (adjacent-text concat or
 *              preserved text): never repair
 * First decision wins; only meaningful while the segment is empty. */
static inline void seg_note(P *p, int what) {
    if (p->n_tbl == 0 || p->fz_brk) return;
    int k = p->n_tbl - 1;
    if (p->olen != p->tb_fpt[k]) return;   /* segment already has bytes */
    if (p->tb_sj[k] == SJ_NONE) p->tb_sj[k] = (uint8_t)what;
}

/* Begin emitting fostered content: stash the table segment tail and
 * rewind out to the foster insertion point, so the normal emitters see
 * the true preceding output.  Scoped (#id) extraction bails: fostering
 * shifts stored out-offsets and the combination is rare. */
static void fz_begin(P *p) {
    if (p->fz_brk) { p->bail = 1; return; }   /* nesting is a caller bug */
    if (p->scope_id) { p->bail = 1; return; }
    int k = p->n_tbl - 1;
    Py_ssize_t fpt = p->tb_fpt[k];
    Py_ssize_t tl = p->olen - fpt;
    if (!p->scratch || p->scratch_cap < p->out_cap) {
        PyMem_Free(p->scratch);
        p->scratch = PyMem_Malloc(p->out_cap > 64 ? p->out_cap : 64);
        if (!p->scratch) { p->scratch_cap = 0; p->bail = 1; return; }
        p->scratch_cap = p->out_cap > 64 ? p->out_cap : 64;
    }
    p->foster_copied += tl;
    if (p->foster_copied > (Py_ssize_t)4 << 20) { p->bail = 1; return; }
    memcpy(p->scratch, p->out + fpt, tl);
    p->fz_taillen = tl;
    p->fz_sav_fpt = fpt;
    p->olen = fpt;
    p->fz_brk = 1;
}

/* End the bracket: re-append the segment tail after the fostered
 * content and repair the join at the new boundary. */
static void fz_end(P *p) {
    if (!p->fz_brk) return;
    p->fz_brk = 0;
    if (p->bail) return;
    int k = p->n_tbl - 1;
    Py_ssize_t fpt = p->fz_sav_fpt;
    Py_ssize_t tl = p->fz_taillen;
    Py_ssize_t grew = p->olen - fpt;
    const uint8_t *tail = p->scratch;
    p->tb_fpt[k] = p->olen;            /* zone grew by `grew` */
    if (grew > 0) {
        int end_sp = p->out[p->olen - 1] == ' ';
        if (p->tb_sj[k] == SJ_SPACE && end_sp) {
            tail++; tl--;              /* collapse now-redundant join */
            p->tb_sj[k] = SJ_SUPP;     /* it is latent again */
        } else if (p->tb_sj[k] == SJ_SUPP && !end_sp) {
            /* materialize the suppressed join (segment head); with an
             * empty segment this is the table's own entry join, which
             * tree-order places AFTER the fostered content */
            putb(p, ' ');
            p->tb_sj[k] = SJ_SPACE;
        }
    }
    memcpy(p->out + p->olen, tail, tl);
    p->olen += tl;
}

/* Open a redirect bracket iff the CURRENT emission targets the foster
 * zone: the stack top is itself fostered, or foster-inserts are armed
 * (_in_table_anything_else / fostered table text) with a table-ish
 * insert parent.  Mirrors python _insert_node's per-insert decision.
 * Returns 1 if a bracket was opened (caller must fz_end). */
static int fz_enter(P *p) {
    if (p->fz_brk) return 0;           /* already redirected */
    int zone = (p->sp > 0 && p->st_fz[p->sp - 1]) ||
               (p->foster_arm && is_tableish(p->sp > 0 ? p->st_tag[p->sp - 1] : -1));
    if (!zone) return 0;
    tb_sync(p);
    if (!p->n_tbl) { p->bail = 1; return 0; }
    fz_begin(p);
    return !p->bail;
}

/* entity decode: s[i] is the char after '&'. Writes decoded UTF-8 to
 * dst (cap 16), sets *adv = source chars consumed after the '&'.
 * Returns decoded length, or 0 if not a reference.
 * Mirrors entities.py _match_ref with in_attribute=False. */
static int decode_entity(const uint8_t *s, Py_ssize_t i, Py_ssize_t n,
                         uint8_t dst[16], Py_ssize_t *adv) {
    if (i >= n) return 0;
    if (s[i] == '#') {
        Py_ssize_t j = i + 1;
        long cp = 0; int any = 0;
        if (j < n && (s[j] == 'x' || s[j] == 'X')) {
            j++;
            while (j < n) {
                uint8_t c = s[j]; int d;
                if (c >= '0' && c <= '9') d = c - '0';
                else if (c >= 'a' && c <= 'f') d = c - 'a' + 10;
                else if (c >= 'A' && c <= 'F') d = c - 'A' + 10;
                else break;
                if (cp < 0x200000) cp = cp * 16 + d;
                any = 1; j++;
            }
            if (!any) return 0;   /* '&#x' with no digits: not a ref */
        } else {
            while (j < n && s[j] >= '0' && s[j] <= '9') {
                if (cp < 0x200000) cp = cp * 10 + (s[j] - '0');
                any = 1; j++;
            }
            if (!any) return 0;
        }
        if (j < n && s[j] == ';') j++;
        *adv = j - i;
        static const int w1252[32] = {
            0x20AC,0x81,0x201A,0x0192,0x201E,0x2026,0x2020,0x2021,
            0x02C6,0x2030,0x0160,0x2039,0x0152,0x8D,0x017D,0x8F,
            0x90,0x2018,0x2019,0x201C,0x201D,0x2022,0x2013,0x2014,
            0x02DC,0x2122,0x0161,0x203A,0x0153,0x9D,0x017E,0x0178};
        if (cp >= 0x80 && cp <= 0x9F) cp = w1252[cp - 0x80];
        if (cp == 0 || cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF))
            cp = 0xFFFD;
        int k = 0;
        if (cp < 0x80) dst[k++] = (uint8_t)cp;
        else if (cp < 0x800) {
            dst[k++] = 0xC0 | (cp >> 6); dst[k++] = 0x80 | (cp & 0x3F);
        } else if (cp < 0x10000) {
            dst[k++] = 0xE0 | (cp >> 12); dst[k++] = 0x80 | ((cp >> 6) & 0x3F);
            dst[k++] = 0x80 | (cp & 0x3F);
        } else {
            dst[k++] = 0xF0 | (cp >> 18); dst[k++] = 0x80 | ((cp >> 12) & 0x3F);
            dst[k++] = 0x80 | ((cp >> 6) & 0x3F); dst[k++] = 0x80 | (cp & 0x3F);
        }
        return k;
    }
    uint8_t c = s[i];
    if (!((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))) return 0;
    int len = 1;
    while (i + len < n && len < g_max_ent_name) {
        c = s[i + len];
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
            (c >= '0' && c <= '9')) len++;
        else break;
    }
    for (int ln = len; ln >= 2; ln--) {
        int vlen; const char *v;
        if (i + ln < n && s[i + ln] == ';') {
            v = ent_lookup(g_semi, 8191, s + i, ln, &vlen);
            if (v) { memcpy(dst, v, vlen); *adv = ln + 1; return vlen; }
        }
        v = ent_lookup(g_nosemi, 511, s + i, ln, &vlen);
        if (v) { memcpy(dst, v, vlen); *adv = ln; return vlen; }
    }
    return 0;
}

/* byte classes for the normalizing emitter */
#define BC_PLAIN 0
#define BC_WS    1   /* \t \n \f \r ' '  (and \xa0 via C2-pair) */
#define BC_AMP   2
#define BC_C2    3
static uint8_t g_bclass[256];

/* flush a pending collapsed space per arena.node_text: a space is kept
 * unless it is leading in the run AND (output empty or ends in ' ') */
static inline void flush_pend(P *p, int *pend, int sawnon) {
    if (*pend) {
        if (sawnon || (out_nonempty(p) && !out_lastspace(p))) {
            seg_note(p, SJ_SPACE);
            putb(p, ' ');
        } else {
            seg_note(p, SJ_SUPP);
        }
        *pend = 0;
    }
}

/* Emit a normalized text run s[a,b): collapse [\t\n\f\r \xa0]+ to ' ',
 * suppress one leading space when output empty/ends-in-space.
 * decode: handle '&' references. */
static void emit_norm(P *p, Py_ssize_t a, Py_ssize_t b, int decode) {
    const uint8_t *s = p->s;
    int pend = 0, sawnon = 0;
    uint8_t dbuf[16];
    while (a < b) {
        uint8_t bc = g_bclass[s[a]];
        if (bc == BC_PLAIN ||
            (bc == BC_AMP && !decode) ||
            (bc == BC_C2 && !(a + 1 < b && s[a + 1] == 0xA0))) {
            Py_ssize_t q = a + 1;
            while (q < b) {
                uint8_t qc = g_bclass[s[q]];
                if (qc == BC_PLAIN) { q++; continue; }
                if (qc == BC_AMP && !decode) { q++; continue; }
                if (qc == BC_C2 && !(q + 1 < b && s[q + 1] == 0xA0)) {
                    q++; continue;
                }
                break;
            }
            flush_pend(p, &pend, sawnon);
            seg_note(p, SJ_RAW);
            memcpy(p->out + p->olen, s + a, q - a);
            p->olen += q - a;
            sawnon = 1;
            a = q;
        } else if (bc == BC_WS) {
            pend = 1; a++;
        } else if (bc == BC_C2) {       /* C2 A0 pair == nbsp */
            pend = 1; a += 2;
        } else {                        /* BC_AMP, decode on */
            Py_ssize_t adv = 0;
            int dl = decode_entity(s, a + 1, p->n, dbuf, &adv);
            if (dl <= 0) {
                flush_pend(p, &pend, sawnon);
                seg_note(p, SJ_RAW);
                putb(p, '&'); sawnon = 1; a++;
            } else {
                for (int k = 0; k < dl; ) {
                    uint8_t dc = dbuf[k];
                    uint8_t cls = g_bclass[dc];
                    if (cls == BC_WS) { pend = 1; k++; }
                    else if (cls == BC_C2 && k + 1 < dl && dbuf[k+1] == 0xA0) {
                        pend = 1; k += 2;
                    } else {
                        flush_pend(p, &pend, sawnon);
                        seg_note(p, SJ_RAW);
                        putb(p, dc); sawnon = 1; k++;
                    }
                }
                a += 1 + adv;
            }
        }
    }
    flush_pend(p, &pend, sawnon);
}

/* Emit a preserved run (pre/title/textarea ancestry): raw bytes, with
 * entity decode only (no whitespace collapsing). */
static void emit_preserve(P *p, Py_ssize_t a, Py_ssize_t b, int decode) {
    const uint8_t *s = p->s;
    uint8_t dbuf[16];
    while (a < b) {
        seg_note(p, SJ_RAW);
        if (decode) {
            const uint8_t *amp = memchr(s + a, '&', b - a);
            Py_ssize_t stop = amp ? (amp - s) : b;
            if (stop > a) {
                memcpy(p->out + p->olen, s + a, stop - a);
                p->olen += stop - a;
                a = stop;
            }
            if (a >= b) break;
            Py_ssize_t adv = 0;
            int dl = decode_entity(s, a + 1, p->n, dbuf, &adv);
            if (dl <= 0) { putb(p, '&'); a++; }
            else {
                memcpy(p->out + p->olen, dbuf, dl);
                p->olen += dl;
                a += 1 + adv;
            }
        } else {
            memcpy(p->out + p->olen, s + a, b - a);
            p->olen += b - a;
            a = b;
        }
    }
}

/* ---- open-element stack + active formatting list -------------------- */

static void push_el(P *p, int tag) {
    if (p->sp >= MAXSTACK) { p->bail = 1; return; }
    /* the tree parent is the insertion point (stack top before push);
       it stays valid even after mid-stack removals (form end, a-in-a)
       because no modeled construct reparents nodes */
    {
        int top = p->sp > 0 ? p->st_tag[p->sp - 1] : -1;
        int topfz = p->sp > 0 && p->st_fz[p->sp - 1];
        if (!topfz && p->foster_arm && is_tableish(top)) {
            /* directly fostered: the TREE parent is the table's parent */
            tb_sync(p);
            if (!p->n_tbl) { p->bail = 1; return; }
            p->st_ptag[p->sp] = p->st_ptag[p->tb_spidx[p->n_tbl - 1]];
            p->st_fz[p->sp] = 1;
        } else {
            p->st_ptag[p->sp] = top;
            p->st_fz[p->sp] = (uint8_t)topfz;
        }
    }
    p->st_tag[p->sp] = tag;
    p->st_ser[p->sp] = ++p->serial;
    p->st_oout[p->sp] = p->olen;
    p->sp++;
}

/* entering an element in document order: block/br single-space rule */
static inline void maybe_space(P *p, int tag) {
    if ((tflags(tag) & F_BLOCK) || tag == T_br) {
        if (out_nonempty(p) && !out_lastspace(p)) {
            seg_note(p, SJ_SPACE);
            putb(p, ' ');
        } else {
            seg_note(p, SJ_SUPP);
        }
    }
}

/* the entry join of an insert, routed to the foster zone when the
 * insert parent lives there (fz_enter) */
static void join_space(P *p, int tag) {
    if ((tflags(tag) & F_BLOCK) || tag == T_br) {
        int o = fz_enter(p);
        if (p->bail) return;
        maybe_space(p, tag);
        if (o) fz_end(p);
    }
}

/* insert an element node (join + push); returns its serial */
static uint32_t insert_el(P *p, int tag) {
    join_space(p, tag);
    push_el(p, tag);
    return p->serial;
}

static void insert_empty_el(P *p, int tag) { join_space(p, tag); }

/* does the current token carry id="<scope_id>"? (valid only between
 * handle_tag's capture and the token's own element insert) */
static inline int token_id_matches(P *p) {
    if (!p->scope_id || p->scope_done || !p->pid_valid) return 0;
    if (p->pid_b - p->pid_a != p->scope_id_len) return 0;
    if (memchr(p->s + p->pid_a, '&', p->scope_id_len)) { p->bail = 1; return 0; }
    return memcmp(p->s + p->pid_a, p->scope_id, p->scope_id_len) == 0;
}

/* token element just pushed: open the scope on it */
static inline void scope_on_push(P *p) {
    if (token_id_matches(p)) {
        p->scope_done = 1;
        p->scope_active = 1;
        p->scope_ser = p->serial;      /* the element just pushed */
        p->base_olen = p->olen;
        p->scope_a = p->olen;
    }
    p->pid_valid = 0;                  /* consumed by the token element */
}

/* token element was a void insert (no push): empty-subtree scope */
static inline void scope_on_void(P *p) {
    if (token_id_matches(p)) {
        p->scope_done = 1;
        p->scope_a = p->scope_b = p->olen;
    }
    p->pid_valid = 0;
}

/* token-origin element insert (vs synthesized/reconstructed inserts,
 * which must NOT consume the token's id attribute) */
static uint32_t insert_el_tok(P *p, int tag) {
    join_space(p, tag);
    push_el(p, tag);
    scope_on_push(p);
    return p->serial;
}

static void insert_empty_el_tok(P *p, int tag) {
    join_space(p, tag);
    scope_on_void(p);
}

static void pop_el(P *p) {
    if (p->sp <= 0) { p->bail = 1; return; }
    p->sp--;
}

static int top_tag(P *p) { return p->sp > 0 ? p->st_tag[p->sp - 1] : -1; }

/* treebuilder.pop_to_close(name): pop until name popped (or empty) */
static void pop_to_close(P *p, int tag) {
    while (p->sp > 0) {
        int t = p->st_tag[--p->sp];
        if (t == tag) return;
    }
}

static void pop_to_close_headings(P *p) {
    while (p->sp > 0) {
        int t = p->st_tag[--p->sp];
        if (tflags(t) & F_HEADING) return;
    }
}

/* generate_implied_end_tags(exclude); exclude == -1 means the reference
 * nil-exclude quirk: NO-OP (treebuilder.py generate_implied_end_tags) */
static void gen_implied(P *p, int exclude) {
    if (exclude < 0) return;
    while (p->sp > 0) {
        int t = p->st_tag[p->sp - 1];
        if (t == exclude || !(tflags(t) & F_IMPLIED)) return;
        p->sp--;
    }
}

static void remove_stack_serial(P *p, uint32_t ser) {
    /* mid-stack removal (form end, a-in-a) leaves deeper elements in
     * the removed element's TREE subtree while they leave our stack;
     * streaming can no longer delimit the scope subtree -> bail */
    if (p->scope_active && ser == p->scope_ser) { p->bail = 1; return; }
    for (int i = p->sp - 1; i >= 0; i--) {
        if (p->st_ser[i] == ser) {
            memmove(p->st_tag + i, p->st_tag + i + 1,
                    (p->sp - i - 1) * sizeof(int32_t));
            memmove(p->st_ser + i, p->st_ser + i + 1,
                    (p->sp - i - 1) * sizeof(uint32_t));
            memmove(p->st_ptag + i, p->st_ptag + i + 1,
                    (p->sp - i - 1) * sizeof(int32_t));
            memmove(p->st_fz + i, p->st_fz + i + 1,
                    (Py_ssize_t)(p->sp - i - 1));
            memmove(p->st_oout + i, p->st_oout + i + 1,
                    (p->sp - i - 1) * sizeof(Py_ssize_t));
            p->sp--;
            return;
        }
    }
}

static int on_stack_ser(P *p, uint32_t ser) {
    for (int i = p->sp - 1; i >= 0; i--)
        if (p->st_ser[i] == ser) return i;
    return -1;
}

/* treebuilder._in_scope: walk top-down (max 100), target vs barriers.
 * extra: 0 none, 1 button, 2 list (ol/ul) */
static int in_scope_x(P *p, int tag, int extra) {
    int lo = p->sp - 100; if (lo < 0) lo = 0;
    for (int i = p->sp - 1; i >= lo; i--) {
        int t = p->st_tag[i];
        if (t == tag) return 1;
        uint32_t f = tflags(t);
        if (f & F_SCOPEBASE) return 0;
        if (extra == 1 && t == T_button) return 0;
        if (extra == 2 && (f & F_LISTEXTRA)) return 0;
    }
    return 0;
}

static int in_scope(P *p, int tag) { return in_scope_x(p, tag, 0); }
static int in_button_scope(P *p, int tag) { return in_scope_x(p, tag, 1); }
static int in_list_scope(P *p, int tag) { return in_scope_x(p, tag, 2); }

/* any heading in (plain) scope */
static int headings_in_scope(P *p) {
    int lo = p->sp - 100; if (lo < 0) lo = 0;
    for (int i = p->sp - 1; i >= lo; i--) {
        uint32_t f = tflags(p->st_tag[i]);
        if (f & F_HEADING) return 1;
        if (f & F_SCOPEBASE) return 0;
    }
    return 0;
}

/* ---- active formatting list (treebuilder fmt ops) ------------------- */

static void push_marker(P *p) {
    if (p->fp >= MAXFMT) { p->bail = 1; return; }
    p->f_mark[p->fp] = 1;
    p->f_tag[p->fp] = -1;
    p->f_ser[p->fp] = 0;
    p->fp++;
}

static void remove_fmt_at(P *p, int idx) {
    memmove(p->f_tag + idx, p->f_tag + idx + 1,
            (p->fp - idx - 1) * sizeof(int32_t));
    memmove(p->f_ser + idx, p->f_ser + idx + 1,
            (p->fp - idx - 1) * sizeof(uint32_t));
    memmove(p->f_mark + idx, p->f_mark + idx + 1,
            (p->fp - idx - 1) * sizeof(uint8_t));
    memmove(p->f_attr + idx, p->f_attr + idx + 1,
            (p->fp - idx - 1) * sizeof(uint8_t));
    p->fp--;
}

/* push_fmt with Noah's-ark (treebuilder.push_fmt): Python evicts the
 * entry at which it sees the 3rd same-name-AND-same-attrs match
 * (scanning back to the last marker). We track only a has-attrs bit:
 * two no-attr elements are exactly equal; comparisons involving
 * attr-bearing elements are undecidable here -> bail only when they
 * could flip the outcome. */
static void push_fmt(P *p, int tag, uint32_t ser, int has_attrs) {
    if (p->fp >= MAXFMT) { p->bail = 1; return; }
    if (!has_attrs) {
        int seen = 0;
        for (int i = p->fp - 1; i >= 0; i--) {
            if (p->f_mark[i]) break;
            if (p->f_tag[i] == tag && !p->f_attr[i]) {
                if (++seen == 3) { remove_fmt_at(p, i); break; }
            }
        }
    } else {
        /* python compares parsed attr DICTS; identical raw spans prove
         * dict equality (legacy pages repeat byte-identical formatters
         * like <font color="#000">), differing spans prove nothing.
         * Evict exactly when the 3rd hash-equal match precedes any
         * ambiguous (hash-different) same-tag entry; bail only when an
         * eviction decision could depend on undecidable equality. */
        int he = 0, hd_before = 0, evict = -1;
        for (int i = p->fp - 1; i >= 0; i--) {
            if (p->f_mark[i]) break;
            if (p->f_tag[i] == tag && p->f_attr[i]) {
                if (p->f_ahash[i] == p->cur_ahash) {
                    if (++he == 3) { evict = i; break; }
                } else {
                    hd_before++;
                }
            }
        }
        if (evict >= 0) {
            if (hd_before) { p->bail = 1; return; }
            remove_fmt_at(p, evict);
        } else if (he + hd_before >= 3) {
            p->bail = 1;
            return;
        }
    }
    p->f_tag[p->fp] = tag;
    p->f_ser[p->fp] = ser;
    p->f_mark[p->fp] = 0;
    p->f_attr[p->fp] = (uint8_t)has_attrs;
    p->f_ahash[p->fp] = has_attrs ? p->cur_ahash : 0;
    p->fp++;
}

/* get_active_fmt: last entry before a marker with this tag; index or -1 */
static int get_active_fmt(P *p, int tag) {
    for (int i = p->fp - 1; i >= 0; i--) {
        if (p->f_mark[i]) return -1;
        if (p->f_tag[i] == tag) return i;
    }
    return -1;
}

/* (remove_fmt_at moved above push_fmt) */

static void clear_fmt_to_marker(P *p) {
    while (p->fp > 0) {
        p->fp--;
        if (p->f_mark[p->fp]) return;
    }
}

/* treebuilder.reconstruct_fmt: re-open formatting elements whose
 * entries are not on the stack. Clones are pushed as normal open
 * elements (they affect preserve-ws ancestry), entries repointed. */
static void reconstruct_fmt(P *p) {
    if (p->fp == 0) return;
    int last = p->fp - 1;
    if (p->f_mark[last] || on_stack_ser(p, p->f_ser[last]) >= 0) return;
    int pos = last, skip = 0;
    while (1) {
        if (pos == 0) { skip = 1; break; }
        pos--;
        if (p->f_mark[pos] || on_stack_ser(p, p->f_ser[pos]) >= 0) break;
    }
    while (1) {
        if (!skip) pos++;
        skip = 0;
        /* insert_elem(name): maybe_space + push (formatters are never
         * block, but mirror the generic insert for exactness) */
        uint32_t ser = insert_el(p, p->f_tag[pos]);
        if (p->bail) return;
        p->f_ser[pos] = ser;
        if (pos == last) break;
    }
}

/* ---- raw-content scanning (tokenizer _read_raw mirrors) ------------- */

static inline int is_close_delim(uint8_t c) {
    return c == '\t' || c == '\n' || c == '\f' || c == '\r' || c == ' ' ||
           c == '/' || c == '>';
}

/* tokenizer._find_close: case-insensitive "</tag" followed by delim/EOF */
static void find_close(P *p, Py_ssize_t i, const uint8_t *tag, int nlen,
                       Py_ssize_t *content_end, Py_ssize_t *close) {
    const uint8_t *s = p->s; Py_ssize_t n = p->n;
    Py_ssize_t pos = i;
    while (1) {
        const uint8_t *lt = memchr(s + pos, '<', n - pos);
        if (!lt) { *content_end = n; *close = -1; return; }
        Py_ssize_t k = lt - s;
        if (k + 1 < n && s[k + 1] == '/' && k + 2 + nlen <= n &&
            strncasecmp((const char *)s + k + 2, (const char *)tag, nlen) == 0) {
            Py_ssize_t after = k + 2 + nlen;
            if (after >= n || is_close_delim(s[after])) {
                *content_end = k; *close = k; return;
            }
        }
        pos = k + 1;
    }
}

/* tokenizer._find_breakout: '<' + ascii alpha */
static Py_ssize_t find_breakout(P *p, Py_ssize_t i) {
    const uint8_t *s = p->s; Py_ssize_t n = p->n;
    Py_ssize_t j = i;
    while (1) {
        const uint8_t *lt = memchr(s + j, '<', n - j);
        if (!lt) return -1;
        Py_ssize_t k = lt - s;
        if (k + 1 >= n) return -1;
        uint8_t c = s[k + 1];
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) return k;
        j = k + 1;
    }
}

/* tokenizer._script_end: ScriptData escaped/double-escaped scanner */
static void script_end(P *p, Py_ssize_t i, Py_ssize_t *content_end,
                       Py_ssize_t *close) {
    const uint8_t *s = p->s; Py_ssize_t n = p->n;
    int state = 0; /* 0 plain, 1 escaped, 2 double-escaped */
    Py_ssize_t j = i;
    while (j < n) {
        uint8_t c = s[j];
        if (c == '<') {
            if (j + 3 < n && s[j+1] == '!' && s[j+2] == '-' && s[j+3] == '-') {
                if (state == 0) state = 1;
                j += 4; continue;
            }
            if (j + 1 < n && s[j+1] == '/' && j + 8 <= n &&
                strncasecmp((const char *)s + j + 2, "script", 6) == 0 &&
                (j + 8 >= n || is_close_delim(s[j + 8]) || s[j + 8] == '\0')) {
                /* lookahead delim or EOF (regex (?=[..]|$)) */
                if (j + 8 == n || is_close_delim(s[j + 8])) {
                    if (state == 0 || state == 1) {
                        *content_end = j; *close = j; return;
                    }
                    state = 1; j += 8; continue;
                }
            }
            if (j + 7 <= n &&
                strncasecmp((const char *)s + j + 1, "script", 6) == 0 &&
                (j + 7 == n || is_close_delim(s[j + 7]))) {
                if (state == 1) state = 2;
                j += 7; continue;
            }
            j++; continue;
        }
        if (c == '-') {
            if (j + 2 < n && s[j+1] == '-' && s[j+2] == '>') {
                if (state == 1 || state == 2) state = 0;
                j += 3; continue;
            }
            j++; continue;
        }
        /* skip to next '<' or '-' */
        {
            const uint8_t *lt = memchr(s + j, '<', n - j);
            const uint8_t *da = memchr(s + j, '-', n - j);
            if (!lt && !da) break;
            const uint8_t *m = (!lt) ? da : (!da) ? lt : (lt < da ? lt : da);
            j = m - s;
        }
    }
    *content_end = n; *close = -1;
}

/* skip the attribute section of a tag; mirrors tokenizer._attrs scan.
 * On entry j is just past the tag name. Returns next pos (past '>'),
 * sets *sc and *eof. */
static Py_ssize_t skip_attrs(P *p, Py_ssize_t j, int *sc, int *eof,
                             int *has_attrs, int capture_id) {
    const uint8_t *s = p->s; Py_ssize_t n = p->n;
    *sc = 0; *eof = 0;
    if (has_attrs) *has_attrs = 0;
    while (1) {
        while (j < n && (s[j]=='\t'||s[j]=='\n'||s[j]=='\f'||s[j]=='\r'||s[j]==' '))
            j++;
        if (j >= n) { *eof = 1; return n; }
        uint8_t c = s[j];
        if (c == '>') return j + 1;
        if (c == '/') {
            if (j + 1 < n && s[j + 1] == '>') { *sc = 1; return j + 2; }
            j++; continue;
        }
        /* attribute name ([^\t\n\f\r />=]+, '=' may lead and join) */
        if (has_attrs) *has_attrs = 1;
        Py_ssize_t na = j;
        if (c == '=') j++;
        while (j < n) {
            c = s[j];
            if (c=='\t'||c=='\n'||c=='\f'||c=='\r'||c==' '||c=='/'||c=='>'||c=='=')
                break;
            j++;
        }
        /* first id attribute wins (duplicate attrs: first declaration) */
        int is_id = capture_id && !p->pid_valid && j - na == 2 &&
                    (s[na] | 32) == 'i' && (s[na + 1] | 32) == 'd';
        while (j < n && (s[j]=='\t'||s[j]=='\n'||s[j]=='\f'||s[j]=='\r'||s[j]==' '))
            j++;
        if (j < n && s[j] == '=') {
            j++;
            while (j < n && (s[j]=='\t'||s[j]=='\n'||s[j]=='\f'||s[j]=='\r'||s[j]==' '))
                j++;
            if (j >= n) { *eof = 1; return n; }
            uint8_t q = s[j];
            if (q == '"' || q == '\'') {
                const uint8_t *k = memchr(s + j + 1, q, n - j - 1);
                if (!k) { *eof = 1; return n; }
                if (is_id) { p->pid_a = j + 1; p->pid_b = k - s; p->pid_valid = 1; }
                j = (k - s) + 1;
            } else {
                Py_ssize_t vs = j;
                while (j < n) {
                    c = s[j];
                    if (c=='\t'||c=='\n'||c=='\f'||c=='\r'||c==' '||c=='>')
                        break;
                    j++;
                }
                if (is_id) { p->pid_a = vs; p->pid_b = j; p->pid_valid = 1; }
            }
        } else if (is_id) {
            /* valueless id attr: attrs["id"] is None in the kernel ->
             * never equal to a scope id; mark as zero-len at na so a
             * non-empty scope id cannot match */
            p->pid_a = p->pid_b = na; p->pid_valid = 1;
        }
    }
}

/* consume the `</tag ...>` end tag at `close` (rcdata/rawtext close) */
static void consume_end_tag(P *p, Py_ssize_t close) {
    const uint8_t *s = p->s; Py_ssize_t n = p->n;
    Py_ssize_t j = close + 2;
    /* _TAGNAME_RE: [a-zA-Z][^\t\n\f\r />]* */
    if (j < n && ((s[j]>='a'&&s[j]<='z')||(s[j]>='A'&&s[j]<='Z'))) {
        j++;
        while (j < n) {
            uint8_t c = s[j];
            if (c=='\t'||c=='\n'||c=='\f'||c=='\r'||c==' '||c=='/'||c=='>')
                break;
            j++;
        }
    }
    int sc, eof;
    Py_ssize_t nx = skip_attrs(p, j, &sc, &eof, NULL, 0);
    p->pos = eof ? n : nx;
}

/* ---- in-body token handlers (treebuilder _in_body mirrors) ---------- */

static void dispatch_start(P *p, int tag, int sc, int has_attrs,
                           const uint8_t *name, int nlen);
static void dispatch_end(P *p, int tag);
static void handle_end_body(P *p, int tag);

/* treebuilder._any_other_end_tag */
static void any_other_end(P *p, int tag) {
    for (int i = p->sp - 1; i >= 0; i--) {
        int t = p->st_tag[i];
        if (t == tag) {
            gen_implied(p, tag);
            pop_to_close(p, tag);
            return;
        }
        if (tflags(t) & F_SPECIAL) return;
    }
}

/* treebuilder._adoption_agency, restricted: handles the no-furthest-
 * block cases exactly; BAILS on a real adoption run (special element
 * above the formatting element) because that moves nodes. */
/* is serial an active-formatting entry (whole list, markers skipped) */
static int in_fmt_ser(P *p, uint32_t ser) {
    for (int i = 0; i < p->fp; i++)
        if (!p->f_mark[i] && p->f_ser[i] == ser) return i;
    return -1;
}

/* Full adoption agency (treebuilder._adoption_agency, itself mirroring
 * reference HtmlTreeBuilderState.swift:1060-1161: 8 outer / 3 inner
 * iterations, 64-deep scan, no bookmark).  The tree moves it performs
 * preserve the DFS order of ALREADY-EMITTED text in every modeled case
 * (the furthest-block subtree moves under a clone chain at the same
 * relative position), so only stack/fmt bookkeeping and st_ptag
 * (preserve-gp) fixes are needed.  Bails when the common ancestor is
 * table-ish (last_node would FOSTER, re-homing emitted text) or on any
 * zone mismatch. */
static void aaa(P *p, int tag) {
    for (int outer = 0; outer < 8; outer++) {
        int fi = get_active_fmt(p, tag);
        if (fi < 0) { any_other_end(p, tag); return; }
        uint32_t fser = p->f_ser[fi];
        int ftag = p->f_tag[fi];
        int fhas = p->f_attr[fi];
        if (on_stack_ser(p, fser) < 0) {
            remove_fmt_at(p, fi);
            any_other_end(p, tag);
            return;
        }
        if (!in_scope(p, ftag)) return;
        int size = p->sp < 64 ? p->sp : 64;
        int seen = 0, if_idx = -1, ic_idx = -1;
        for (int si = 0; si < size; si++) {
            if (p->st_ser[si] == fser) { ic_idx = si - 1; seen = 1; }
            else if (seen && (tflags(p->st_tag[si]) & F_SPECIAL)) {
                if_idx = si; break;
            }
        }
        if (if_idx < 0) {
            pop_to_close(p, ftag);
            remove_fmt_at(p, fi);
            return;
        }
        if (ic_idx < 0) { p->bail = 1; return; }   /* fmt at stack bottom */
        int common_tag = p->st_tag[ic_idx];
        uint32_t furthest_ser = p->st_ser[if_idx];
        if (is_tableish(common_tag)) { p->bail = 1; return; }  /* fosters */
        if (p->st_fz[if_idx] != p->st_fz[ic_idx]) { p->bail = 1; return; }
        /* the adopter splice changes the preserve-ws ancestry of text
         * ALREADY emitted under the furthest block (e.g. pre's
         * grandchildren lose preserve when a clone slots in between);
         * streaming output cannot be re-normalized -> bail when an
         * affected ancestor is preserve-ish AND anything was emitted
         * since the furthest block opened (future text follows the
         * fixed-up st_ptag chain and needs no bail) */
        if (((tflags(p->st_tag[if_idx]) | tflags(p->st_ptag[if_idx]) |
              tflags(common_tag)) & F_PRESERVE) &&
            p->olen != p->st_oout[if_idx]) {
            p->bail = 1;
            return;
        }
        uint8_t zone_fz = p->st_fz[if_idx];
        /* inner loop: walk DOWN from furthest toward fmt */
        uint32_t node_ser = furthest_ser;
        int node_on = 1;
        uint32_t last_ser = furthest_ser;       /* last_node */
        /* clone chain (child->parent): parent tag of furthest, then of
         * each successive clone; fixed up after the final append.
         * Recorded by SERIAL (stack indices shift on removals). */
        uint32_t chain_ser[3]; int n_chain = 0;
        int chain_block = 0;   /* any clone with a block tag ('s') */
        for (int inner = 0; inner < 3; inner++) {
            int ni = on_stack_ser(p, node_ser);
            node_on = ni >= 0;
            if (node_on && ni > 0) { node_ser = p->st_ser[ni - 1]; ni = ni - 1; }
            else if (node_on) { p->bail = 1; return; }  /* at bottom */
            if (in_fmt_ser(p, node_ser) < 0) {
                remove_stack_serial(p, node_ser);
                if (p->bail) return;
                continue;
            }
            if (node_ser == fser) break;
            /* replace node with a fresh clone in fmt list AND stack */
            int nfi = in_fmt_ser(p, node_ser);
            int nsi = on_stack_ser(p, node_ser);
            if (nsi < 0) { p->bail = 1; return; }   /* off-stack fmt node */
            uint32_t clone = ++p->serial;
            if (tflags(p->f_tag[nfi]) & F_BLOCK) chain_block = 1;
            p->f_ser[nfi] = clone;
            p->st_ser[nsi] = clone;
            /* tree: last_node reparented under the clone */
            if (n_chain < 3) chain_ser[n_chain++] = clone;
            node_ser = clone;
            last_ser = clone;
            (void)nsi;
        }
        /* last_node appended to the common ancestor; fix the st_ptag
         * (preserve-gp) chain: furthest -> clone_1 -> ... -> common */
        {
            int prev_tag = common_tag;
            for (int k = n_chain - 1; k >= 0; k--) {
                int idx = on_stack_ser(p, chain_ser[k]);
                if (idx < 0) { p->bail = 1; return; }
                p->st_ptag[idx] = prev_tag;
                prev_tag = p->st_tag[idx];
            }
            int fsi = on_stack_ser(p, furthest_ser);
            int fmi = on_stack_ser(p, fser);
            if (fsi < 0 || fmi < 0 || fmi > fsi) { p->bail = 1; return; }
            /* in-fmt elements the 3-iteration cap left unprocessed
             * between fmt and furthest remain OPEN at a tree position
             * BEFORE the moved block: future content into them would
             * reorder vs the stream -> bail */
            for (int si = fmi + 1; si < fsi; si++) {
                int okc = 0;
                for (int k = 0; k < n_chain; k++)
                    if (p->st_ser[si] == chain_ser[k]) { okc = 1; break; }
                if (!okc) { p->bail = 1; return; }
            }
            p->st_ptag[fsi] = prev_tag;
            /* the entry directly above furthest (its direct child, if
             * any) is adopted by the new clone of fmt */
            if (fsi + 1 < p->sp && p->st_ptag[fsi + 1] == p->st_tag[fsi])
                p->st_ptag[fsi + 1] = ftag;
            /* adopter: clone of fmt wrapping furthest's children,
             * appended to furthest and pushed right after it */
            if (p->sp >= MAXSTACK) { p->bail = 1; return; }
            int at = fsi + 1;
            memmove(p->st_tag + at + 1, p->st_tag + at,
                    (p->sp - at) * sizeof(int32_t));
            memmove(p->st_ser + at + 1, p->st_ser + at,
                    (p->sp - at) * sizeof(uint32_t));
            memmove(p->st_ptag + at + 1, p->st_ptag + at,
                    (p->sp - at) * sizeof(int32_t));
            memmove(p->st_fz + at + 1, p->st_fz + at,
                    (Py_ssize_t)(p->sp - at));
            memmove(p->st_oout + at + 1, p->st_oout + at,
                    (p->sp - at) * sizeof(Py_ssize_t));
            p->st_tag[at] = ftag;
            p->st_ser[at] = ++p->serial;
            p->st_ptag[at] = p->st_tag[fsi];
            p->st_fz[at] = zone_fz;
            p->sp++;
            (void)fhas;
            /* Splice joins: the chain clones wrap the furthest block's
             * emitted SUBTREE (their joins land at its start) and the
             * adopter wraps its CHILDREN (join at child-content start).
             * jsoup's block list includes the formatter 's', so these
             * can be real block joins.  For a BLOCK furthest both
             * positions sit at a join boundary the stream already
             * resolved — provably a no-op either way.  For a non-block
             * furthest with nothing emitted since its push, all the
             * splice joins collapse to ONE join at the current end;
             * with content in between a retro-insert would be needed
             * -> bail. */
            if (chain_block || (tflags(ftag) & F_BLOCK) || ftag == T_br) {
                if (tflags(p->st_tag[fsi]) & F_BLOCK) {
                    /* join boundary: suppressed / already materialized */
                } else if (p->olen != p->st_oout[fsi]) {
                    p->bail = 1;
                    return;
                } else {
                    int opened = 0;
                    if (zone_fz && !p->fz_brk) {
                        tb_sync(p);
                        if (!p->n_tbl) { p->bail = 1; return; }
                        fz_begin(p);
                        if (p->bail) return;
                        opened = 1;
                    }
                    if (out_nonempty(p) && !out_lastspace(p)) {
                        seg_note(p, SJ_SPACE);
                        putb(p, ' ');
                    } else {
                        seg_note(p, SJ_SUPP);
                    }
                    if (opened) fz_end(p);
                }
            }
        }
        /* fmt element leaves both the stack and the list */
        remove_stack_serial(p, fser);
        if (p->bail) return;
        {
            int rfi = in_fmt_ser(p, fser);
            if (rfi >= 0) remove_fmt_at(p, rfi);
        }
    }
}

static void close_p_if_open(P *p) {
    if (in_button_scope(p, T_p)) {
        gen_implied(p, T_p);
        pop_to_close(p, T_p);
        p->foster_arm = 0;   /* nested mode-dispatch end (jsoup quirk) */
    }
}

/* insert_from_token: sc queues a synthetic end tag (processed by the
 * dispatch wrapper AFTER the caller's post-insert steps, mirroring the
 * tokenizer pending queue). Returns the element serial. */
static uint32_t insert_from_token(P *p, int tag, int sc) {
    uint32_t ser = insert_el_tok(p, tag);
    if (sc) p->pending_end = tag;
    return ser;
}

static void handle_end_body(P *p, int tag) {
    uint32_t f = tflags(tag);
    if (f & F_FORMATTER) { aaa(p, tag); return; }
    if (tag == T_body || tag == T_html) return;  /* mode-only effects */
    if (f & F_ENDCLOSER) {
        if (!in_scope(p, tag)) return;
        gen_implied(p, -1);           /* nil-exclude: no-op */
        pop_to_close(p, tag);
        return;
    }
    if (tag == T_form) {
        int had = p->have_form;
        uint32_t fs = p->form_ser;
        p->have_form = 0; p->form_ser = 0;
        if (!had || !in_scope(p, T_form)) return;
        gen_implied(p, -1);
        remove_stack_serial(p, fs);
        return;
    }
    if (tag == T_p) {
        if (!in_button_scope(p, T_p)) {
            /* synth <p> then close it: net effect is the block space,
             * fostered when armed with a table-ish insert parent */
            int o = fz_enter(p);
            if (p->bail) return;
            maybe_space(p, T_p);
            if (o) fz_end(p);
            return;
        }
        gen_implied(p, T_p);
        pop_to_close(p, T_p);
        return;
    }
    if (tag == T_li) {
        if (!in_list_scope(p, T_li)) return;
        gen_implied(p, T_li);
        pop_to_close(p, T_li);
        return;
    }
    if (f & F_DDDT) {
        if (!in_scope(p, tag)) return;
        gen_implied(p, tag);
        pop_to_close(p, tag);
        return;
    }
    if (f & F_HEADING) {
        if (!headings_in_scope(p)) return;
        gen_implied(p, tag);
        pop_to_close_headings(p);
        return;
    }
    if (f & F_APPLET) {
        if (!in_scope(p, tag)) return;
        gen_implied(p, -1);
        pop_to_close(p, tag);
        clear_fmt_to_marker(p);
        return;
    }
    if (tag == T_br) return;          /* </br> ignored */
    any_other_end(p, tag);
}

/* rcdata element (title/textarea): content is a preserved text node */
static void start_rcdata(P *p, int tag, int sc,
                         const uint8_t *name, int nlen) {
    if (sc) {
        insert_el_tok(p, tag);
        if (tag == T_title && !p->title_set) {
            p->title_set = 1; p->title_a = p->title_b = 0;
        }
        pop_el(p);
        return;
    }
    insert_el_tok(p, tag);
    Py_ssize_t i = p->pos, content_end, close;
    find_close(p, i, name, nlen, &content_end, &close);
    if (close < 0) {
        Py_ssize_t bj = find_breakout(p, i);
        if (bj >= 0) {      /* rcdata breakout deviation */
            if (tag == T_title && !p->title_set) {
                p->title_set = 1; p->title_a = i; p->title_b = bj;
            }
            { int o = fz_enter(p); if (p->bail) return;
              emit_preserve(p, i, bj, 1); if (o) fz_end(p); }
            p->pos = bj;
            pop_el(p);
            return;
        }
        content_end = p->n;
        if (tag == T_title && !p->title_set) {
            p->title_set = 1; p->title_a = i; p->title_b = content_end;
        }
        { int o = fz_enter(p); if (p->bail) return;
          emit_preserve(p, i, content_end, 1); if (o) fz_end(p); }
        p->pos = p->n;
        pop_el(p);          /* EOF in Text mode pops */
        return;
    }
    if (tag == T_title && !p->title_set) {
        p->title_set = 1; p->title_a = i; p->title_b = content_end;
    }
    { int o = fz_enter(p); if (p->bail) return;
      emit_preserve(p, i, content_end, 1); if (o) fz_end(p); }
    consume_end_tag(p, close);
    pop_el(p);
}

/* rawtext/script element: content is a DataNode (excluded from text) */
static void start_rawtext(P *p, int tag, int sc,
                          const uint8_t *name, int nlen, int is_script) {
    if (sc) { insert_el_tok(p, tag); pop_el(p); return; }
    insert_el_tok(p, tag);
    Py_ssize_t i = p->pos, content_end, close;
    if (is_script) script_end(p, i, &content_end, &close);
    else find_close(p, i, name, nlen, &content_end, &close);
    if (close >= 0) consume_end_tag(p, close);
    else p->pos = p->n;
    pop_el(p);
}

static void handle_start_body(P *p, int tag, int sc, int has_attrs,
                              const uint8_t *name, int nlen);

/* the _in_head handling shared by M_HEAD / after-head re-entry /
 * in-body TO_HEAD starts. Returns 1 if handled. */
static int to_head_start(P *p, int tag, int sc,
                         const uint8_t *name, int nlen) {
    if (tag == T_base || tag == T_basefont || tag == T_bgsound ||
        tag == T_command || tag == T_link || tag == T_meta) {
        insert_empty_el_tok(p, tag);
        return 1;
    }
    if (tag == T_title) { start_rcdata(p, tag, sc, name, nlen); return 1; }
    if (tag == T_noframes || tag == T_style) {
        start_rawtext(p, tag, sc, name, nlen, 0);
        return 1;
    }
    if (tag == T_script) { start_rawtext(p, tag, sc, name, nlen, 1); return 1; }
    if (tag == T_head) return 1;      /* error, ignore */
    return 0;
}

static void handle_start_body(P *p, int tag, int sc, int has_attrs,
                              const uint8_t *name, int nlen) {
    uint32_t f = tflags(tag);
    if (f & F_BAIL) { p->bail = 1; return; }
    if (tag == T_html) {
        if (has_attrs && p->scope_id && !p->scope_done) p->bail = 1;
        return;
    }
    if (f & F_TOHEAD) {                           /* incl noscript? no */
        to_head_start(p, tag, sc, name, nlen);
        return;
    }
    if (tag == T_body) {
        /* duplicate <body>: Python merges attrs into the existing body
         * (setdefault) — could introduce the scope id */
        if (has_attrs && p->scope_id && !p->scope_done) p->bail = 1;
        return;
    }
    if (f & F_PCLOSER) {
        close_p_if_open(p);
        insert_from_token(p, tag, sc);
        return;
    }
    if (f & F_HEADING) {
        close_p_if_open(p);
        if (p->sp > 0 && (tflags(top_tag(p)) & F_HEADING)) pop_el(p);
        insert_from_token(p, tag, sc);
        return;
    }
    if (tag == T_pre || tag == T_listing) {
        close_p_if_open(p);
        insert_from_token(p, tag, sc);
        return;
    }
    if (tag == T_form) {
        if (p->have_form) return;                 /* nested form dropped */
        close_p_if_open(p);
        p->form_ser = insert_from_token(p, tag, sc);
        p->have_form = 1;
        return;
    }
    if (tag == T_li) {
        for (int i = p->sp - 1; i >= 0; i--) {
            int t = p->st_tag[i];
            if (t == T_li) {
                handle_end_body(p, T_li);
                p->foster_arm = 0;   /* nested mode-dispatch end (jsoup quirk) */
                break;
            }
            uint32_t tf = tflags(t);
            if ((tf & F_SPECIAL) && !(tf & F_LIBREAK)) break;
        }
        close_p_if_open(p);
        insert_from_token(p, tag, sc);
        return;
    }
    if (f & F_DDDT) {
        for (int i = p->sp - 1; i >= 0; i--) {
            int t = p->st_tag[i];
            if (tflags(t) & F_DDDT) {
                handle_end_body(p, t);
                p->foster_arm = 0;   /* nested mode-dispatch end (jsoup quirk) */
                break;
            }
            uint32_t tf = tflags(t);
            if ((tf & F_SPECIAL) && !(tf & F_LIBREAK)) break;
        }
        close_p_if_open(p);
        insert_from_token(p, tag, sc);
        return;
    }
    /* plaintext / table / select / frameset / svg / math are F_BAIL */
    if (tag == T_button) {
        if (in_button_scope(p, T_button)) {
            handle_end_body(p, T_button);
            p->foster_arm = 0;   /* nested mode-dispatch end (jsoup quirk) */
            if (p->bail) return;
            /* python: return self.process(t) — re-dispatch through the
             * mode (re-arms via anything-else in table modes) */
            dispatch_start(p, tag, sc, has_attrs, name, nlen);
            return;
        }
        reconstruct_fmt(p);
        insert_from_token(p, tag, sc);
        return;
    }
    if (tag == T_a) {
        if (get_active_fmt(p, T_a) >= 0) {
            handle_end_body(p, T_a);              /* AAA path */
            p->foster_arm = 0;   /* nested mode-dispatch end (jsoup quirk) */
            if (p->bail) return;
            int rem = get_active_fmt(p, T_a);
            if (rem >= 0) {
                uint32_t rs = p->f_ser[rem];
                remove_fmt_at(p, rem);
                remove_stack_serial(p, rs);
            }
        }
        reconstruct_fmt(p);
        {
            uint32_t ser = insert_from_token(p, tag, sc);
            push_fmt(p, tag, ser, has_attrs);
        }
        return;
    }
    if (f & F_FORMATTER) {   /* b big code em font i nobr s small strike strong tt u */
        reconstruct_fmt(p);
        {
            uint32_t ser = insert_from_token(p, tag, sc);
            push_fmt(p, tag, ser, has_attrs);
        }
        return;
    }
    if (f & F_APPLET) {
        reconstruct_fmt(p);
        insert_from_token(p, tag, sc);
        push_marker(p);
        return;
    }
    if (tag == T_table) {
        /* _in_body_start table: close p unless quirks, enter table mode.
         * Register the foster level BEFORE the insert so the table's own
         * entry join is noted as segment head (tree order puts fostered
         * content before it). */
        if (p->quirks != 1 && in_button_scope(p, T_p)) close_p_if_open(p);
        tb_sync(p);
        if (p->n_tbl >= MAXTBL) { p->bail = 1; return; }
        int k = p->n_tbl++;
        p->tb_fpt[k] = p->olen;
        p->tb_sj[k] = SJ_NONE;
        p->tb_spidx[k] = p->sp;
        p->tb_ser[k] = 0;
        insert_from_token(p, tag, sc);   /* sc end handled mode-aware */
        if (p->bail) return;
        p->tb_ser[k] = p->st_ser[p->sp - 1];
        p->mode = M_TABLE;
        return;
    }
    if (tag == T_select) {
        reconstruct_fmt(p);
        insert_from_token(p, tag, sc);
        /* treebuilder._in_body select: IN_SELECT_IN_TABLE when the mode
         * is any table-ish one (incl. fostered selects from InTable) */
        p->mode = (p->mode == M_CAPTION || p->mode == M_CELL ||
                   p->mode == M_TABLE || p->mode == M_TBODY ||
                   p->mode == M_ROW)
                      ? M_SELECT_TB : M_SELECT;
        return;
    }
    if (f & F_EMPTYFMT) {    /* area br embed img keygen wbr */
        reconstruct_fmt(p);
        insert_empty_el_tok(p, tag);
        return;
    }
    if (tag == T_input) {
        reconstruct_fmt(p);
        insert_empty_el_tok(p, tag);
        return;
    }
    if (f & F_MEDIA) {       /* param source track */
        insert_empty_el_tok(p, tag);
        return;
    }
    if (tag == T_hr) {
        close_p_if_open(p);
        insert_empty_el_tok(p, tag);
        return;
    }
    if (tag == T_image) {    /* rewrite to img */
        handle_start_body(p, T_img, sc, has_attrs, (const uint8_t *)"img", 3);
        return;
    }
    if (tag == T_textarea) {
        start_rcdata(p, tag, sc, name, nlen);
        return;
    }
    if (tag == T_xmp) {
        close_p_if_open(p);
        reconstruct_fmt(p);
        start_rawtext(p, tag, sc, name, nlen, 0);
        return;
    }
    if (tag == T_iframe || tag == T_noembed) {
        start_rawtext(p, tag, sc, name, nlen, 0);
        return;
    }
    if (tag == T_optgroup || tag == T_option) {
        if (top_tag(p) == T_option) {
            handle_end_body(p, T_option);
            p->foster_arm = 0;   /* nested mode-dispatch end (jsoup quirk) */
        }
        reconstruct_fmt(p);
        insert_from_token(p, tag, sc);
        return;
    }
    if (tag == T_rp || tag == T_rt) {
        if (in_scope(p, T_ruby)) {
            gen_implied(p, -1);       /* no-arg: no-op */
            insert_from_token(p, tag, sc);
        }
        return;
    }
    if (f & F_DROP) return;           /* caption col head tbody td ... */
    reconstruct_fmt(p);
    insert_from_token(p, tag, sc);
}


/* ---- table machinery (treebuilder _in_table.. _in_cell mirrors) ----- */

static int run_all_ws(P *p, Py_ssize_t a, Py_ssize_t b, int decode);

static int in_table_scope(P *p, int tag) {
    for (int i = p->sp - 1; i >= 0; i--) {
        int t = p->st_tag[i];
        if (t == tag) return 1;
        if (t == T_html || t == T_table) return 0;
    }
    return 0;
}

static void clear_to_table_ctx(P *p) {
    while (p->sp > 0) {
        int t = top_tag(p);
        if (t == T_table || t == T_html) return;
        p->sp--;
    }
}

static void clear_to_tbody_ctx(P *p) {
    while (p->sp > 0) {
        int t = top_tag(p);
        if (t == T_tbody || t == T_tfoot || t == T_thead || t == T_html)
            return;
        p->sp--;
    }
}

static void clear_to_tr_ctx(P *p) {
    while (p->sp > 0) {
        int t = top_tag(p);
        if (t == T_tr || t == T_html) return;
        p->sp--;
    }
}

/* treebuilder._reset_insertion_mode (non-fragment) */
static void reset_insertion_mode(P *p) {
    for (int i = p->sp - 1; i >= 0; i--) {
        int t = p->st_tag[i];
        int last = (i == 0);
        if (t == T_select) { p->mode = M_SELECT; return; }
        if ((t == T_td || t == T_th) && !last) { p->mode = M_CELL; return; }
        if (t == T_tr) { p->mode = M_ROW; return; }
        if (t == T_tbody || t == T_thead || t == T_tfoot) {
            p->mode = M_TBODY; return;
        }
        if (t == T_caption) { p->mode = M_CAPTION; return; }
        if (t == T_colgroup) { p->mode = M_COLGROUP; return; }
        if (t == T_table) { p->mode = M_TABLE; return; }
        if (t == T_head || t == T_body) { p->mode = M_BODY; return; }
        if (t == T_html) { p->mode = M_PRE; return; }   /* BeforeHead */
        if (last) { p->mode = M_BODY; return; }
    }
    p->mode = M_BODY;
}

/* pending table characters (treebuilder IN_TABLE_TEXT): spans buffered
 * while in table/tbody/tr context; whitespace-only -> inserted as text
 * under the table-ish element, anything else would FOSTER (re-homed
 * before the table => emission reorder) -> bail to the python kernel */
static void pend_add(P *p, Py_ssize_t a, Py_ssize_t b, int decode) {
    if (p->n_pend >= 32) { p->bail = 1; return; }
    p->pend_tx[p->n_pend][0] = a;
    p->pend_tx[p->n_pend][1] = b;
    p->pend_decode[p->n_pend] = (uint8_t)decode;
    p->n_pend++;
}

static void pend_flush(P *p) {
    if (!p->n_pend || p->bail) return;
    int nonws = 0;
    for (int i = 0; i < p->n_pend; i++)
        if (!run_all_ws(p, p->pend_tx[i][0], p->pend_tx[i][1],
                        p->pend_decode[i])) { nonws = 1; break; }
    /* non-ws text runs through the InBody char path with foster armed
     * (treebuilder._in_table_text): reconstruct + insert, re-homed
     * before the table when the insert parent is table-ish.  Ws-only
     * inserts plainly under the current element (no reconstruct). */
    if (nonws) p->foster_arm = 1;
    int o = fz_enter(p);
    if (p->bail) { p->foster_arm = 0; return; }
    if (nonws) reconstruct_fmt(p);
    if (p->bail) { if (o) fz_end(p); p->foster_arm = 0; return; }
    int parent, gp;
    if (p->foster_arm && is_tableish(top_tag(p))) {
        /* text re-homes before the table, under the table's TREE parent
         * (preserve-ws ancestry follows the foster target) */
        int ti = p->tb_spidx[p->n_tbl - 1];
        parent = p->st_ptag[ti];
        if (ti >= 1 && p->st_tag[ti - 1] != parent) {
            p->bail = 1;   /* mid-stack removal in between: gp unknown */
            p->foster_arm = 0;
            return;
        }
        gp = ti >= 1 ? p->st_ptag[ti - 1] : -1;
    } else {
        parent = top_tag(p);
        gp = p->sp > 0 ? p->st_ptag[p->sp - 1] : -1;
    }
    int preserve = (tflags(parent) & F_PRESERVE) ||
                   (tflags(gp) & F_PRESERVE);
    for (int i = 0; i < p->n_pend; i++) {
        if (preserve)
            emit_preserve(p, p->pend_tx[i][0], p->pend_tx[i][1],
                          p->pend_decode[i]);
        else
            emit_norm(p, p->pend_tx[i][0], p->pend_tx[i][1],
                      p->pend_decode[i]);
    }
    if (o) fz_end(p);
    p->foster_arm = 0;
    p->n_pend = 0;
}

static void handle_end_table_mode(P *p, int tag);
static void handle_start_table_mode(P *p, int tag, int sc, int has_attrs,
                                    const uint8_t *name, int nlen);

/* M_TABLE end tags (_in_table end branch) */
static void handle_end_table_mode(P *p, int tag) {
    if (tag == T_table) {
        if (!in_table_scope(p, T_table)) return;     /* error, ignore */
        pop_to_close(p, T_table);
        reset_insertion_mode(p);
        return;
    }
    if (tag == T_body || tag == T_caption || tag == T_col ||
        tag == T_colgroup || tag == T_html || tag == T_tbody ||
        tag == T_td || tag == T_tfoot || tag == T_th || tag == T_thead ||
        tag == T_tr)
        return;                                       /* error, ignore */
    /* _in_table_anything_else for END tags runs InBody processing with
     * foster-inserts armed — every InBody end-tag branch only pops or
     * removes, EXCEPT a stray </p> (synthesizes a fostered empty <p>
     * whose block-space lands in the foster zone) and a real adoption
     * run (aaa() bails on node-moving cases itself).  Bracket to the
     * zone so any emission fosters correctly. */
    p->foster_arm = 1;
    handle_end_body(p, tag);
    p->foster_arm = 0;
}

/* M_TABLE start tags (_in_table start branch) */
static void handle_start_table_mode(P *p, int tag, int sc, int has_attrs,
                                    const uint8_t *name, int nlen) {
    if (tag == T_caption) {
        clear_to_table_ctx(p);
        push_marker(p);
        insert_el_tok(p, tag);
        p->mode = M_CAPTION;
        return;
    }
    if (tag == T_colgroup) {
        clear_to_table_ctx(p);
        insert_el_tok(p, tag);
        p->mode = M_COLGROUP;
        return;
    }
    if (tag == T_col) {
        clear_to_table_ctx(p);
        insert_el(p, T_colgroup);        /* synthesized, no token attrs */
        p->mode = M_COLGROUP;
        dispatch_start(p, tag, sc, has_attrs, name, nlen);
        return;
    }
    if (tag == T_tbody || tag == T_tfoot || tag == T_thead) {
        clear_to_table_ctx(p);
        insert_el_tok(p, tag);
        p->mode = M_TBODY;
        return;
    }
    if (tag == T_td || tag == T_th || tag == T_tr) {
        clear_to_table_ctx(p);
        insert_el(p, T_tbody);           /* synthesized */
        p->mode = M_TBODY;
        dispatch_start(p, tag, sc, has_attrs, name, nlen);
        return;
    }
    if (tag == T_table) {
        /* nested <table>: acts as </table> then reprocess */
        if (in_table_scope(p, T_table)) {
            pop_to_close(p, T_table);
            reset_insertion_mode(p);
            dispatch_start(p, tag, sc, has_attrs, name, nlen);
        }
        return;
    }
    if (tag == T_style) { start_rawtext(p, tag, sc, name, nlen, 0); return; }
    if (tag == T_script) { start_rawtext(p, tag, sc, name, nlen, 1); return; }
    if (tag == T_form) {
        if (p->have_form) return;
        /* inserted EMPTY in table context (no push), UNfostered
         * (python's form branch does not arm); join_space routes the
         * block join into the zone when the top is a fostered element */
        {
            int arm = p->foster_arm;
            p->foster_arm = 0;
            insert_empty_el_tok(p, tag);
            p->foster_arm = arm;
        }
        p->have_form = 1;
        p->form_ser = 0;                 /* not on the stack */
        return;
    }
    if (tag == T_input) {
        /* type=hidden inserts in place, others foster; attr values are
         * not captured here -> undecidable, fall back */
        p->bail = 1;
        return;
    }
    /* _in_table_anything_else: InBody processing with foster-inserts
     * armed.  With a table-ish insert parent the element re-homes
     * before the table (emission bracketed to the foster zone); with a
     * fostered element already open (topfz) it nests inside it, which
     * is also the zone. */
    p->foster_arm = 1;
    handle_start_body(p, tag, sc, has_attrs, name, nlen);
    p->foster_arm = 0;
}


/* ---- remaining table-mode dispatchers ------------------------------- */

static void close_cell(P *p);

/* M_TBODY (_in_table_body) */
static void tbody_exit(P *p, int tag, int is_end, int sc, int has_attrs,
                       const uint8_t *name, int nlen) {
    /* _exit_table_body */
    if (!(in_table_scope(p, T_tbody) || in_table_scope(p, T_thead) ||
          in_table_scope(p, T_tfoot)))
        return;                                       /* error, ignore */
    clear_to_tbody_ctx(p);
    /* process(("end", current)) -> pops the tbody-ish element */
    {
        int cur = top_tag(p);
        if (in_table_scope(p, cur)) {
            clear_to_tbody_ctx(p);
            pop_el(p);
            p->mode = M_TABLE;
        }
    }
    if (is_end) dispatch_end(p, tag);
    else dispatch_start(p, tag, sc, has_attrs, name, nlen);
}

static void handle_start_tbody(P *p, int tag, int sc, int has_attrs,
                               const uint8_t *name, int nlen) {
    if (tag == T_tr) {
        clear_to_tbody_ctx(p);
        insert_el_tok(p, tag);
        p->mode = M_ROW;
        return;
    }
    if (tag == T_th || tag == T_td) {
        clear_to_tbody_ctx(p);
        insert_el(p, T_tr);              /* synthesized */
        p->mode = M_ROW;
        dispatch_start(p, tag, sc, has_attrs, name, nlen);
        return;
    }
    if (tag == T_caption || tag == T_col || tag == T_colgroup ||
        tag == T_tbody || tag == T_tfoot || tag == T_thead) {
        tbody_exit(p, tag, 0, sc, has_attrs, name, nlen);
        return;
    }
    handle_start_table_mode(p, tag, sc, has_attrs, name, nlen);
}

static void handle_end_tbody(P *p, int tag) {
    if (tag == T_tbody || tag == T_tfoot || tag == T_thead) {
        if (!in_table_scope(p, tag)) return;
        clear_to_tbody_ctx(p);
        pop_el(p);
        p->mode = M_TABLE;
        return;
    }
    if (tag == T_table) { tbody_exit(p, tag, 1, 0, 0, NULL, 0); return; }
    if (tag == T_body || tag == T_caption || tag == T_col ||
        tag == T_colgroup || tag == T_html || tag == T_td || tag == T_th ||
        tag == T_tr)
        return;
    handle_end_table_mode(p, tag);
}

/* M_ROW (_in_row) */
static int row_end_tr(P *p) {
    if (!in_table_scope(p, T_tr)) return 0;
    clear_to_tr_ctx(p);
    pop_el(p);
    p->mode = M_TBODY;
    return 1;
}

static void handle_start_row(P *p, int tag, int sc, int has_attrs,
                             const uint8_t *name, int nlen) {
    if (tag == T_th || tag == T_td) {
        clear_to_tr_ctx(p);
        insert_el_tok(p, tag);           /* sc ignored (python insert_elem) */
        p->mode = M_CELL;
        push_marker(p);
        return;
    }
    if (tag == T_caption || tag == T_col || tag == T_colgroup ||
        tag == T_tbody || tag == T_tfoot || tag == T_thead || tag == T_tr) {
        if (row_end_tr(p))
            dispatch_start(p, tag, sc, has_attrs, name, nlen);
        return;
    }
    handle_start_table_mode(p, tag, sc, has_attrs, name, nlen);
}

static void handle_end_row(P *p, int tag) {
    if (tag == T_tr) { row_end_tr(p); return; }
    if (tag == T_table) {
        if (row_end_tr(p)) dispatch_end(p, tag);
        return;
    }
    if (tag == T_tbody || tag == T_tfoot || tag == T_thead) {
        if (!in_table_scope(p, tag)) return;
        row_end_tr(p);
        dispatch_end(p, tag);
        return;
    }
    if (tag == T_body || tag == T_caption || tag == T_col ||
        tag == T_colgroup || tag == T_html || tag == T_td || tag == T_th)
        return;
    handle_end_table_mode(p, tag);
}

/* M_CELL (_in_cell) */
static void handle_end_cell(P *p, int tag) {
    if (tag == T_td || tag == T_th) {
        if (!in_table_scope(p, tag)) { p->mode = M_ROW; return; }
        gen_implied(p, -1);              /* nil-exclude: no-op */
        pop_to_close(p, tag);
        clear_fmt_to_marker(p);
        p->mode = M_ROW;
        return;
    }
    if (tag == T_body || tag == T_caption || tag == T_col ||
        tag == T_colgroup || tag == T_html)
        return;
    if (tag == T_table || tag == T_tbody || tag == T_tfoot ||
        tag == T_thead || tag == T_tr) {
        if (!in_table_scope(p, tag)) return;
        close_cell(p);
        dispatch_end(p, tag);
        return;
    }
    handle_end_body(p, tag);
}

static void close_cell(P *p) {
    if (in_table_scope(p, T_td)) handle_end_cell(p, T_td);
    else handle_end_cell(p, T_th);
}

static void handle_start_cell(P *p, int tag, int sc, int has_attrs,
                              const uint8_t *name, int nlen) {
    if (tag == T_caption || tag == T_col || tag == T_colgroup ||
        tag == T_tbody || tag == T_td || tag == T_tfoot || tag == T_th ||
        tag == T_thead || tag == T_tr) {
        if (!(in_table_scope(p, T_td) || in_table_scope(p, T_th))) return;
        close_cell(p);
        dispatch_start(p, tag, sc, has_attrs, name, nlen);
        return;
    }
    handle_start_body(p, tag, sc, has_attrs, name, nlen);
}

/* M_CAPTION (_in_caption) */
static int caption_close(P *p) {
    if (!in_table_scope(p, T_caption)) return 0;
    gen_implied(p, -1);
    pop_to_close(p, T_caption);
    clear_fmt_to_marker(p);
    p->mode = M_TABLE;
    return 1;
}

static void handle_start_caption(P *p, int tag, int sc, int has_attrs,
                                 const uint8_t *name, int nlen) {
    if (tag == T_caption || tag == T_col || tag == T_colgroup ||
        tag == T_tbody || tag == T_td || tag == T_tfoot || tag == T_th ||
        tag == T_thead || tag == T_tr) {
        if (caption_close(p))
            dispatch_start(p, tag, sc, has_attrs, name, nlen);
        return;
    }
    handle_start_body(p, tag, sc, has_attrs, name, nlen);
}

static void handle_end_caption(P *p, int tag) {
    if (tag == T_caption) { caption_close(p); return; }
    if (tag == T_table) {
        if (caption_close(p)) dispatch_end(p, tag);
        return;
    }
    if (tag == T_body || tag == T_col || tag == T_colgroup ||
        tag == T_html || tag == T_tbody || tag == T_td || tag == T_tfoot ||
        tag == T_th || tag == T_thead || tag == T_tr)
        return;
    handle_end_body(p, tag);
}

/* M_COLGROUP (_in_column_group) */
static void handle_start_colgroup(P *p, int tag, int sc, int has_attrs,
                                  const uint8_t *name, int nlen) {
    if (tag == T_html) {
        if (has_attrs && p->scope_id && !p->scope_done) p->bail = 1;
        return;
    }
    if (tag == T_col) { insert_empty_el_tok(p, tag); return; }
    if (top_tag(p) == T_html) return;    /* error, ignore */
    pop_el(p);
    p->mode = M_TABLE;
    dispatch_start(p, tag, sc, has_attrs, name, nlen);
}

static void handle_end_colgroup(P *p, int tag) {
    if (tag == T_colgroup) {
        if (top_tag(p) == T_html) return;
        pop_el(p);
        p->mode = M_TABLE;
        return;
    }
    if (tag == T_col) return;            /* error, ignore */
    if (top_tag(p) == T_html) return;
    pop_el(p);
    p->mode = M_TABLE;
    dispatch_end(p, tag);
}

/* ---- select modes (_in_select / _in_select_in_table) ---------------- */

static int in_select_scope(P *p, int tag) {
    for (int i = p->sp - 1; i >= 0; i--) {
        int t = p->st_tag[i];
        if (t == tag) return 1;
        if (t != T_optgroup && t != T_option) return 0;
    }
    return 0;
}

/* char insert inside select: no reconstruct (python insert_char) */
static void select_text(P *p, Py_ssize_t a, Py_ssize_t b, int decode) {
    int o = fz_enter(p);                 /* fostered select */
    if (p->bail) return;
    int parent = p->sp > 0 ? p->st_tag[p->sp - 1] : -1;
    int gp = p->sp > 0 ? p->st_ptag[p->sp - 1] : -1;
    if ((tflags(parent) & F_PRESERVE) || (tflags(gp) & F_PRESERVE))
        emit_preserve(p, a, b, decode);
    else
        emit_norm(p, a, b, decode);
    if (o) fz_end(p);
}

static void select_end_select(P *p) {
    if (!in_select_scope(p, T_select)) return;    /* error, ignore */
    pop_to_close(p, T_select);
    reset_insertion_mode(p);
}

static void handle_start_select(P *p, int tag, int sc, int has_attrs,
                                const uint8_t *name, int nlen) {
    if (tag == T_html) {
        if (has_attrs && p->scope_id && !p->scope_done) p->bail = 1;
        return;
    }
    if (tag == T_option) {
        if (top_tag(p) == T_option) pop_el(p);
        insert_el_tok(p, tag);
        return;
    }
    if (tag == T_optgroup) {
        if (top_tag(p) == T_option) pop_el(p);
        if (top_tag(p) == T_optgroup) pop_el(p);
        insert_el_tok(p, tag);
        return;
    }
    if (tag == T_select) { select_end_select(p); return; }
    if (tag == T_input || tag == T_textarea || tag == T_keygen) {
        if (!in_select_scope(p, T_select)) return;  /* error, ignore */
        select_end_select(p);
        dispatch_start(p, tag, sc, has_attrs, name, nlen);
        return;
    }
    if (tag == T_script) { start_rawtext(p, tag, sc, name, nlen, 1); return; }
    /* anything else: error, token ignored */
}

static void handle_end_select(P *p, int tag) {
    if (tag == T_optgroup) {
        if (top_tag(p) == T_option && p->sp >= 2 &&
            p->st_tag[p->sp - 2] == T_optgroup)
            pop_el(p);                              /* implied </option> */
        if (top_tag(p) == T_optgroup) pop_el(p);
        return;
    }
    if (tag == T_option) {
        if (top_tag(p) == T_option) pop_el(p);
        return;
    }
    if (tag == T_select) { select_end_select(p); return; }
    /* anything else: error, ignored */
}

static void handle_start_select_tb(P *p, int tag, int sc, int has_attrs,
                                   const uint8_t *name, int nlen) {
    if (tag == T_caption || tag == T_table || tag == T_tbody ||
        tag == T_tfoot || tag == T_thead || tag == T_tr || tag == T_td ||
        tag == T_th) {
        select_end_select(p);
        dispatch_start(p, tag, sc, has_attrs, name, nlen);
        return;
    }
    handle_start_select(p, tag, sc, has_attrs, name, nlen);
}

static void handle_end_select_tb(P *p, int tag) {
    if (tag == T_caption || tag == T_table || tag == T_tbody ||
        tag == T_tfoot || tag == T_thead || tag == T_tr || tag == T_td ||
        tag == T_th) {
        if (!in_table_scope(p, tag)) return;        /* error, ignore */
        select_end_select(p);
        dispatch_end(p, tag);
        return;
    }
    handle_end_select(p, tag);
}

/* ---- mode dispatch (Initial..AfterHead synthesis + InBody) ---------- */

static void ensure_html(P *p) {
    if (!p->have_html) { push_el(p, T_html); p->have_html = 1; }
}

/* stack.append(head_el) — re-push an existing element: no node insert,
 * no block-space (after-head TO_HEAD re-entry) */
static void push_existing(P *p, int tag, uint32_t ser) {
    if (p->sp >= MAXSTACK) { p->bail = 1; return; }
    p->st_ptag[p->sp] = T_html;   /* only used to re-enter <head> */
    p->st_tag[p->sp] = tag;
    p->st_ser[p->sp] = ser;
    p->sp++;
}

static void enter_head(P *p, int from_tok) {
    ensure_html(p);
    p->head_ser = from_tok ? insert_el_tok(p, T_head)
                           : insert_el(p, T_head);
    p->head_present = 1;
    p->mode = M_HEAD;
}

static void enter_body(P *p, int from_tok) {
    if (from_tok) insert_el_tok(p, T_body);
    else insert_el(p, T_body);
    p->mode = M_BODY;
}

static void dispatch_start(P *p, int tag, int sc, int has_attrs,
                           const uint8_t *name, int nlen) {
    if (p->bail) return;
    p->seen_content = 1;
    if (p->n_pend &&
        (p->mode == M_TABLE || p->mode == M_TBODY || p->mode == M_ROW)) {
        pend_flush(p);
        if (p->bail) return;
    }
    switch (p->mode) {
    case M_TABLE:
        handle_start_table_mode(p, tag, sc, has_attrs, name, nlen);
        goto pending;
    case M_TBODY:
        handle_start_tbody(p, tag, sc, has_attrs, name, nlen);
        goto pending;
    case M_ROW:
        handle_start_row(p, tag, sc, has_attrs, name, nlen);
        goto pending;
    case M_CELL:
        handle_start_cell(p, tag, sc, has_attrs, name, nlen);
        goto pending;
    case M_CAPTION:
        handle_start_caption(p, tag, sc, has_attrs, name, nlen);
        goto pending;
    case M_COLGROUP:
        handle_start_colgroup(p, tag, sc, has_attrs, name, nlen);
        goto pending;
    case M_SELECT:
        handle_start_select(p, tag, sc, has_attrs, name, nlen);
        goto pending;
    case M_SELECT_TB:
        handle_start_select_tb(p, tag, sc, has_attrs, name, nlen);
        goto pending;
    case M_PRE:
        if (tag == T_html) {
            int was = p->have_html;
            ensure_html(p);
            if (!was) scope_on_push(p);       /* <html id=...> */
            else if (has_attrs && p->scope_id && !p->scope_done)
                p->bail = 1;                  /* attr merge could add id */
            return;
        }
        if (tag == T_head) { enter_head(p, 1); return; }
        enter_head(p, 0);
        dispatch_start(p, tag, sc, has_attrs, name, nlen);
        break;
    case M_HEAD:
        if (tag == T_html) return;
        if (tag == T_noscript) {
            insert_el_tok(p, tag);
            p->mode = M_HEADNS;
            return;
        }
        if (to_head_start(p, tag, sc, name, nlen)) return;
        pop_el(p);                    /* pop head */
        p->mode = M_AFTERHEAD;
        dispatch_start(p, tag, sc, has_attrs, name, nlen);
        break;
    case M_HEADNS:
        if (tag == T_html || tag == T_head || tag == T_noscript) return;
        if (tag == T_basefont || tag == T_bgsound || tag == T_link ||
            tag == T_meta) {
            insert_empty_el_tok(p, tag);
            return;
        }
        if (tag == T_noframes || tag == T_style) {
            start_rawtext(p, tag, sc, name, nlen, 0);
            return;
        }
        /* reference InHeadNoscript anything-else renders the TOKEN as a
         * text node ('<img src="foo">' etc.) — needs attr rendering we
         * don't model here -> python kernel */
        p->bail = 1;
        break;
    case M_AFTERHEAD:
        if (tag == T_html || tag == T_head) return;
        if (tag == T_body) { enter_body(p, 1); return; }
        if (tflags(tag) & F_BAIL) { p->bail = 1; return; }
        if (tflags(tag) & F_AHTOHEAD) {
            /* error path: re-enter head for the insert */
            if (p->head_present) {
                push_existing(p, T_head, p->head_ser);
                to_head_start(p, tag, sc, name, nlen);
                if (!p->bail) pop_el(p);   /* remove_from_stack(head) */
            } else {
                to_head_start(p, tag, sc, name, nlen);
            }
            return;
        }
        enter_body(p, 0);
        dispatch_start(p, tag, sc, has_attrs, name, nlen);
        break;
    default:                          /* M_BODY */
        handle_start_body(p, tag, sc, has_attrs, name, nlen);
        goto pending;
    }
    return;
pending:
    if (p->pending_end >= 0 && !p->bail) {
        int t = p->pending_end;
        p->pending_end = -1;
        dispatch_end(p, t);           /* mode-aware (table sc inserts) */
    }
}

static void dispatch_end(P *p, int tag) {
    if (p->bail) return;
    p->seen_content = 1;
    if (p->n_pend &&
        (p->mode == M_TABLE || p->mode == M_TBODY || p->mode == M_ROW)) {
        pend_flush(p);
        if (p->bail) return;
    }
    switch (p->mode) {
    case M_TABLE: handle_end_table_mode(p, tag); return;
    case M_TBODY: handle_end_tbody(p, tag); return;
    case M_ROW: handle_end_row(p, tag); return;
    case M_CELL: handle_end_cell(p, tag); return;
    case M_CAPTION: handle_end_caption(p, tag); return;
    case M_COLGROUP: handle_end_colgroup(p, tag); return;
    case M_SELECT: handle_end_select(p, tag); return;
    case M_SELECT_TB: handle_end_select_tb(p, tag); return;
    case M_PRE:
        if (tag == T_head || tag == T_body || tag == T_html || tag == T_br) {
            enter_head(p, 0);
            dispatch_end(p, tag);
        }
        break;                        /* other end tags ignored */
    case M_HEAD:
        if (tag == T_head) { pop_el(p); p->mode = M_AFTERHEAD; return; }
        if (tag == T_body || tag == T_html || tag == T_br) {
            pop_el(p);
            p->mode = M_AFTERHEAD;
            dispatch_end(p, tag);
            return;
        }
        break;                        /* error, ignore */
    case M_HEADNS:
        if (tag == T_noscript) { pop_el(p); p->mode = M_HEAD; return; }
        if (tag == T_br) { p->bail = 1; return; }  /* renders "</br>" text */
        break;                        /* other end tags: dropped (error) */
        
    case M_AFTERHEAD:
        if (tag == T_body || tag == T_html) {
            enter_body(p, 0);
            dispatch_end(p, tag);
        }
        break;                        /* others ignored */
    default:
        handle_end_body(p, tag);
        break;
    }
}

/* is the (decoded) run whitespace-only per WS = "\t\n\f\r " ? */
static int run_all_ws(P *p, Py_ssize_t a, Py_ssize_t b, int decode) {
    const uint8_t *s = p->s;
    uint8_t dbuf[16];
    while (a < b) {
        uint8_t c = s[a];
        if (c=='\t'||c=='\n'||c=='\f'||c=='\r'||c==' ') { a++; continue; }
        if (c == '&' && decode) {
            Py_ssize_t adv = 0;
            int dl = decode_entity(s, a + 1, p->n, dbuf, &adv);
            if (dl <= 0) return 0;    /* literal '&' */
            for (int k = 0; k < dl; k++) {
                uint8_t d = dbuf[k];
                if (!(d=='\t'||d=='\n'||d=='\f'||d=='\r'||d==' ')) return 0;
            }
            a += 1 + adv;
            continue;
        }
        return 0;
    }
    return 1;
}

/* emit a text node at the current insertion point (head/afterhead:
 * normalized; body: preserve-ws by parent/grandparent) */
static void body_text(P *p, Py_ssize_t a, Py_ssize_t b, int decode) {
    int o = fz_enter(p);                 /* defensive: fz top in body */
    if (p->bail) return;
    reconstruct_fmt(p);
    if (p->bail) { if (o) fz_end(p); return; }
    int parent = p->sp > 0 ? p->st_tag[p->sp - 1] : -1;
    int gp = p->sp > 0 ? p->st_ptag[p->sp - 1] : -1;
    if ((tflags(parent) & F_PRESERVE) || (tflags(gp) & F_PRESERVE))
        emit_preserve(p, a, b, decode);
    else
        emit_norm(p, a, b, decode);
    if (o) fz_end(p);
}

static void dispatch_text(P *p, Py_ssize_t a, Py_ssize_t b, int decode) {
    if (p->bail || a >= b) return;
    switch (p->mode) {
    case M_PRE:
        if (run_all_ws(p, a, b, decode)) return;   /* dropped */
        p->seen_content = 1;
        ensure_html(p);
        push_el(p, T_head);           /* synth head, inserted+popped */
        p->head_ser = p->serial;
        p->head_present = 1;
        pop_el(p);
        enter_body(p, 0);
        body_text(p, a, b, decode);
        break;
    case M_HEAD:
        if (run_all_ws(p, a, b, decode)) {
            emit_norm(p, a, b, decode);            /* text node in head */
            return;
        }
        pop_el(p);                    /* pop head */
        enter_body(p, 0);
        body_text(p, a, b, decode);
        break;
    case M_HEADNS:
        emit_norm(p, a, b, decode);   /* text node inside noscript */
        break;
    case M_AFTERHEAD:
        if (run_all_ws(p, a, b, decode)) {
            emit_norm(p, a, b, decode);            /* text node under html */
            return;
        }
        enter_body(p, 0);
        body_text(p, a, b, decode);
        break;
    case M_TABLE:
    case M_TBODY:
    case M_ROW:
        pend_add(p, a, b, decode);     /* IN_TABLE_TEXT buffering */
        break;
    case M_SELECT:
    case M_SELECT_TB:
        select_text(p, a, b, decode);
        break;
    case M_COLGROUP:
        if (run_all_ws(p, a, b, decode)) {
            emit_norm(p, a, b, decode);           /* ws text in colgroup */
            return;
        }
        if (top_tag(p) == T_html) return;
        pop_el(p);
        p->mode = M_TABLE;
        dispatch_text(p, a, b, decode);
        break;
    default:                           /* M_BODY, M_CAPTION, M_CELL */
        body_text(p, a, b, decode);
        break;
    }
}

/* ---- markup-declaration / bogus-comment position skipping ----------- */

static Py_ssize_t find3(const uint8_t *s, Py_ssize_t n, Py_ssize_t i,
                        const char *pat, int plen) {
    while (i + plen <= n) {
        const uint8_t *hit = memchr(s + i, pat[0], n - i - plen + 1);
        if (!hit) return -1;
        Py_ssize_t k = hit - s;
        if (memcmp(s + k, pat, plen) == 0) return k;
        i = k + 1;
    }
    return -1;
}

/* tokenizer._comment: i is just past "<!--" */
static void skip_comment(P *p, Py_ssize_t i) {
    const uint8_t *s = p->s; Py_ssize_t n = p->n;
    if (i < n && s[i] == '>') { p->pos = i + 1; return; }
    if (i + 1 < n && s[i] == '-' && s[i + 1] == '>') { p->pos = i + 2; return; }
    Py_ssize_t p1 = find3(s, n, i, "-->", 3);
    Py_ssize_t p2 = find3(s, n, i, "--!>", 4);
    if (p2 >= 0 && (p1 < 0 || p2 < p1)) p->pos = p2 + 4;
    else if (p1 >= 0) p->pos = p1 + 3;
    else p->pos = n;
}

static void skip_bogus_comment(P *p, Py_ssize_t i) {
    const uint8_t *hit = memchr(p->s + i, '>', p->n - i);
    p->pos = hit ? (hit - p->s) + 1 : p->n;
}

static Py_ssize_t skip_ws_bytes(const uint8_t *s, Py_ssize_t n, Py_ssize_t j) {
    while (j < n && (s[j]=='\t'||s[j]=='\n'||s[j]=='\f'||s[j]=='\r'||s[j]==' '))
        j++;
    return j;
}

/* tokenizer._doctype quoted-string skip: returns next pos */
static Py_ssize_t doctype_quoted2(const uint8_t *s, Py_ssize_t n,
                                  Py_ssize_t j, int *found) {
    j = skip_ws_bytes(s, n, j);
    if (j < n && (s[j] == '"' || s[j] == '\'')) {
        const uint8_t *k = memchr(s + j + 1, s[j], n - j - 1);
        if (found) *found = 1;
        return k ? (k - s) + 1 : n;
    }
    if (found) *found = 0;
    return j;
}

static Py_ssize_t doctype_quoted(const uint8_t *s, Py_ssize_t n,
                                 Py_ssize_t j) {
    return doctype_quoted2(s, n, j, NULL);
}

/* tokenizer._doctype: i is just past "<!doctype" (7 chars after "<!").
 * Also mirrors the force-quirks computation: a malformed doctype in the
 * INITIAL state sets quirks mode, which changes whether <table> closes
 * an open <p> (treebuilder._in_body_start table branch). */
static void skip_doctype(P *p, Py_ssize_t i) {
    const uint8_t *s = p->s; Py_ssize_t n = p->n;
    int fq = 0;
    Py_ssize_t j = skip_ws_bytes(s, n, i);
    if (j >= n || s[j] == '>') {
        p->pos = j >= n ? n : j + 1;
        fq = 1;
        goto record;
    }
    while (j < n) {                       /* doctype name [^\t\n\f\r >]+ */
        uint8_t c = s[j];
        if (c=='\t'||c=='\n'||c=='\f'||c=='\r'||c==' '||c=='>') break;
        j++;
    }
    j = skip_ws_bytes(s, n, j);
    if (j < n && s[j] != '>') {
        if (j + 6 <= n && strncasecmp((const char *)s + j, "public", 6) == 0) {
            int found;
            Py_ssize_t j2 = doctype_quoted2(s, n, j + 6, &found);
            if (!found) fq = 1;           /* no quoted public id */
            j = doctype_quoted(s, n, j2);
        } else if (j + 6 <= n &&
                   strncasecmp((const char *)s + j, "system", 6) == 0) {
            int found;
            Py_ssize_t j2 = doctype_quoted2(s, n, j + 6, &found);
            if (!found) fq = 1;           /* no quoted system id */
            j = j2;
        } else {
            fq = 1;                        /* unknown keyword */
        }
    }
    {
        const uint8_t *gt = memchr(s + j, '>', n - j);
        if (!gt) fq = 1;
        p->pos = gt ? (gt - s) + 1 : n;
    }
record:
    /* only the INITIAL-state doctype counts (treebuilder._initial) */
    if (!p->seen_content && !p->seen_doctype) {
        p->seen_doctype = 1;
        if (fq) p->quirks = 1;
    }
}

/* ---- the tag-open scanner (tokenizer._tag_open / _end_tag) ---------- */

/* on entry p->pos is at '<' and the next char is tagish */
static void handle_tag(P *p) {
    const uint8_t *s = p->s; Py_ssize_t n = p->n;
    Py_ssize_t i = p->pos + 1;
    uint8_t c = s[i];
    uint8_t nbuf[MAXTAGLEN + 1];
    /* comment/doctype/bogus tokens are skipped (no text effect) but
     * they are still TOKENS: pending table text flushes on any
     * non-char token (treebuilder IN_TABLE_TEXT), which decides the
     * ws-only-vs-foster grouping.  Flush before skipping. */
    if ((c == '!' || c == '?') && p->n_pend &&
        (p->mode == M_TABLE || p->mode == M_TBODY || p->mode == M_ROW)) {
        if (!(c == '!' && i + 8 <= n && memcmp(s + i + 1, "[CDATA[", 7) == 0)) {
            pend_flush(p);
            if (p->bail) return;
        }
    }
    if (c == '!') {
        i++;
        if (i + 1 < n && s[i] == '-' && s[i + 1] == '-') {
            skip_comment(p, i + 2);
            return;
        }
        if (i + 7 <= n && strncasecmp((const char *)s + i, "doctype", 7) == 0) {
            skip_doctype(p, i + 7);
            return;  /* doctype token: ignored in every fast-path mode */
        }
        if (i + 7 <= n && memcmp(s + i, "[CDATA[", 7) == 0) {
            Py_ssize_t k = find3(s, n, i + 7, "]]>", 3);
            Py_ssize_t a = i + 7, b = k < 0 ? n : k;
            p->pos = k < 0 ? n : k + 3;
            dispatch_text(p, a, b, 0);   /* cdata -> char, no decode */
            return;
        }
        skip_bogus_comment(p, i);
        return;
    }
    if (c == '?') { skip_bogus_comment(p, i); return; }
    if (c == '/') {
        i++;
        if (i >= n) {
            /* tokenizer._end_tag: EOF right after "</" -> literal text */
            p->pos = n;
            dispatch_text(p, n - 2, n, 0);
            return;
        }
        c = s[i];
        if (c == '>') { p->pos = i + 1; return; }    /* '</>' ignored */
        if (!((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))) {
            skip_bogus_comment(p, i);
            return;
        }
        int len = 0;
        while (i < n) {
            c = s[i];
            if (c=='\t'||c=='\n'||c=='\f'||c=='\r'||c==' '||c=='/'||c=='>')
                break;
            if (c >= 0x80 || len >= MAXTAGLEN) { p->bail = 1; return; }
            nbuf[len++] = (c >= 'A' && c <= 'Z') ? c + 32 : c;
            i++;
        }
        int sc, eof;
        Py_ssize_t nx = skip_attrs(p, i, &sc, &eof, NULL, 0);
        if (eof) { p->pos = n; return; }             /* token dropped */
        p->pos = nx;
        {
            int tag = intern_tag(p, nbuf, len);
            if (p->bail) return;
            dispatch_end(p, tag);
        }
        return;
    }
    /* start tag */
    {
        int len = 0;
        while (i < n) {
            c = s[i];
            if (c=='\t'||c=='\n'||c=='\f'||c=='\r'||c==' '||c=='/'||c=='>')
                break;
            if (c >= 0x80 || len >= MAXTAGLEN) { p->bail = 1; return; }
            nbuf[len++] = (c >= 'A' && c <= 'Z') ? c + 32 : c;
            i++;
        }
        int sc, eof, has_attrs;
        p->pid_valid = 0;
        Py_ssize_t nx = skip_attrs(p, i, &sc, &eof, &has_attrs,
                                   p->scope_id && !p->scope_done);
        if (eof) { p->pos = n; return; }             /* token dropped */
        p->pos = nx;
        /* raw attr-span hash: byte-identical spans parse to equal attr
         * dicts (the converse does not hold) — see push_fmt's ark */
        p->cur_ahash = has_attrs ? fnv1a(s + i, nx - i) : 0;
        {
            int tag = intern_tag(p, nbuf, len);
            if (p->bail) return;
            dispatch_start(p, tag, sc, has_attrs, nbuf, len);
        }
    }
}

/* ---- main loop (tokenizer._data) ------------------------------------ */

/* EOF while still inside <noscript> renders the reference's "EOF"
 * token-toString artifact as text — python kernel handles it */
static void run_parse(P *p) {
    const uint8_t *s = p->s; Py_ssize_t n = p->n;
    Py_ssize_t start = p->pos, scan = p->pos;
    while (!p->bail) {
        if (scan >= n) {
            if (start < n) dispatch_text(p, start, n, 1);
            if (p->mode == M_HEADNS) p->bail = 1;
            p->pos = n;
            return;
        }
        const uint8_t *lt = memchr(s + scan, '<', n - scan);
        if (!lt) {
            dispatch_text(p, start, n, 1);
            if (p->mode == M_HEADNS) p->bail = 1;
            p->pos = n;
            return;
        }
        Py_ssize_t k = lt - s;
        uint8_t c = (k + 1 < n) ? s[k + 1] : 0;
        if (((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) ||
            c == '!' || c == '/' || c == '?') {
            if (k > start) dispatch_text(p, start, k, 1);
            if (p->bail) return;
            p->pos = k;
            handle_tag(p);
            if (p->bail) return;
            if (p->scope_active && on_stack_ser(p, p->scope_ser) < 0) {
                p->scope_b = p->olen;
                p->scope_active = 0;
                if (p->title_set) { p->pos = p->n; return; }  /* all done */
            }
            start = scan = p->pos;
        } else {
            scan = k + 1;    /* literal '<' stays in the text run */
        }
    }
}

/* Document.title() normalization: entity-decode the rcdata span, then
 * collapse [\t\n\f\r \xa0]+ runs to one space and strip both ends.
 * Writes into dst, returns length. dst cap must be >= 2*(b-a)+16. */
static Py_ssize_t normalize_title(const uint8_t *s, Py_ssize_t a, Py_ssize_t b,
                                  Py_ssize_t n, uint8_t *dst) {
    Py_ssize_t o = 0;
    int pend = 0, started = 0;
    uint8_t dbuf[16];
    while (a < b) {
        uint8_t c = s[a];
        uint8_t dl8[16]; int dl; Py_ssize_t adv;
        const uint8_t *chunk; int chunklen;
        if (c == '&') {
            adv = 0;
            dl = decode_entity(s, a + 1, n, dl8, &adv);
            if (dl <= 0) { dl8[0] = '&'; dl = 1; a++; }
            else a += 1 + adv;
            chunk = dl8; chunklen = dl;
        } else {
            dbuf[0] = c; chunk = dbuf; chunklen = 1; a++;
        }
        for (int k = 0; k < chunklen; k++) {
            uint8_t d = chunk[k];
            if (d=='\t'||d=='\n'||d=='\f'||d=='\r'||d==' ') { pend = 1; continue; }
            if (d == 0xC2) {
                /* peek: nbsp pair inside chunk or source */
                if (k + 1 < chunklen && chunk[k+1] == 0xA0) { pend = 1; k++; continue; }
                if (chunk == dbuf && a < b && s[a] == 0xA0) { pend = 1; a++; continue; }
            }
            if (pend && started) dst[o++] = ' ';
            pend = 0;
            dst[o++] = d;
            started = 1;
        }
    }
    return o;
}

/* ---- Python entry points -------------------------------------------- */

/* decode an rcdata span (title) with entities, return bytes object */
static PyObject *decode_span(const uint8_t *s, Py_ssize_t a, Py_ssize_t b,
                             Py_ssize_t n) {
    Py_ssize_t cap = 2 * (b - a) + 16;
    uint8_t *buf = PyMem_Malloc(cap);
    if (!buf) return PyErr_NoMemory();
    Py_ssize_t o = 0;
    uint8_t dbuf[16];
    while (a < b) {
        const uint8_t *amp = memchr(s + a, '&', b - a);
        Py_ssize_t stop = amp ? (amp - s) : b;
        if (stop > a) { memcpy(buf + o, s + a, stop - a); o += stop - a; a = stop; }
        if (a >= b) break;
        Py_ssize_t adv = 0;
        int dl = decode_entity(s, a + 1, n, dbuf, &adv);
        if (dl <= 0) { buf[o++] = '&'; a++; }
        else { memcpy(buf + o, dbuf, dl); o += dl; a += 1 + adv; }
    }
    PyObject *r = PyUnicode_DecodeUTF8((const char *)buf, o, "replace");
    PyMem_Free(buf);
    return r;
}

static PyObject *py_doc_text(PyObject *self, PyObject *args) {
    PyObject *in;
    const char *scope = NULL;
    Py_ssize_t scope_len = 0;
    if (!PyArg_ParseTuple(args, "U|z#", &in, &scope, &scope_len)) return NULL;
    if (!g_ready) {
        PyErr_SetString(PyExc_RuntimeError, "init_tables not called");
        return NULL;
    }
    Py_ssize_t n;
    const char *u8 = PyUnicode_AsUTF8AndSize(in, &n);
    if (!u8) return NULL;
    if (memchr(u8, 0, n)) Py_RETURN_NONE;       /* NUL -> python kernel */

    P *p = PyMem_Calloc(1, sizeof(P));
    if (!p) return PyErr_NoMemory();
    p->s = (const uint8_t *)u8;
    p->n = n;
    p->out = PyMem_Malloc(2 * n + 64);
    if (!p->out) { PyMem_Free(p); return PyErr_NoMemory(); }
    p->out_cap = 2 * n + 64;
    p->mode = M_PRE;
    p->pending_end = -1;
    if (scope && scope_len > 0) {
        p->scope_id = (const uint8_t *)scope;
        p->scope_id_len = (int)scope_len;
    } else {
        scope = NULL;
    }

    run_parse(p);
    if (!p->bail && p->n_pend) pend_flush(p);   /* EOF flush */
    if (!p->bail && p->scope_active) {       /* EOF with scope open */
        p->scope_b = p->olen;
        p->scope_active = 0;
    }

    PyObject *result = NULL;
    if (p->bail) {
        result = Py_None;
        Py_INCREF(result);
    } else {
        /* final strip of " \t\n\f\r" (arena.node_text _ASCII_WS) */
        Py_ssize_t a = 0, b = p->olen;
        if (scope) {
            if (p->scope_done) { a = p->scope_a; b = p->scope_b; }
            else { a = b = 0; }                  /* no match -> "" */
        }
        while (a < b) {
            uint8_t c = p->out[a];
            if (c=='\t'||c=='\n'||c=='\f'||c=='\r'||c==' ') a++;
            else break;
        }
        while (b > a) {
            uint8_t c = p->out[b - 1];
            if (c=='\t'||c=='\n'||c=='\f'||c=='\r'||c==' ') b--;
            else break;
        }
        PyObject *text = PyUnicode_DecodeUTF8((const char *)p->out + a,
                                              b - a, "replace");
        PyObject *title;
        if (p->title_set) {
            Py_ssize_t cap = 2 * (p->title_b - p->title_a) + 16;
            uint8_t *tb = PyMem_Malloc(cap);
            if (!tb) { PyMem_Free(p->scratch); PyMem_Free(p->out); PyMem_Free(p); return PyErr_NoMemory(); }
            Py_ssize_t tl = normalize_title(p->s, p->title_a, p->title_b,
                                            p->n, tb);
            title = PyUnicode_DecodeUTF8((const char *)tb, tl, "replace");
            PyMem_Free(tb);
        }
        else {
            title = Py_None;
            Py_INCREF(title);
        }
        if (text && title) result = PyTuple_Pack(2, text, title);
        Py_XDECREF(text);
        Py_XDECREF(title);
    }
    PyMem_Free(p->scratch);
    PyMem_Free(p->out);
    PyMem_Free(p);
    return result;
}

/* batch_extract(data, offsets, n, arr_offset, large) ->
 *   (text_data: bytes, text_offsets: bytes[int32 (n+1)],
 *    title_data: bytes, title_offsets: bytes[int32 (n+1)],
 *    bail_mask: bytes[n], n_bails: int)
 *
 * Zero-copy batch interface over an Arrow StringArray's raw buffers:
 * no per-row Python objects on input, and the outputs are ready-made
 * Arrow utf8 buffers (pa.StringArray.from_buffers on the Python side).
 * Rows that bail get empty outputs and a set mask bit; the caller
 * re-runs only those through the Python kernel. */
static PyObject *py_batch_extract(PyObject *self, PyObject *args) {
    Py_buffer data, offs;
    Py_ssize_t n, arr_offset;
    int large;
    const char *scope = NULL;
    Py_ssize_t scope_len = 0;
    if (!PyArg_ParseTuple(args, "y*y*nnp|z#", &data, &offs, &n, &arr_offset,
                          &large, &scope, &scope_len))
        return NULL;
    if (scope && scope_len == 0) scope = NULL;
    if (!g_ready) {
        PyBuffer_Release(&data); PyBuffer_Release(&offs);
        PyErr_SetString(PyExc_RuntimeError, "init_tables not called");
        return NULL;
    }
    const uint8_t *base = (const uint8_t *)data.buf;
    const int32_t *o32 = (const int32_t *)offs.buf;
    const int64_t *o64 = (const int64_t *)offs.buf;

    Py_ssize_t total_in = 0;
    for (Py_ssize_t i = 0; i < n; i++) {
        Py_ssize_t s0 = large ? o64[arr_offset + i] : o32[arr_offset + i];
        Py_ssize_t s1 = large ? o64[arr_offset + i + 1] : o32[arr_offset + i + 1];
        total_in += s1 - s0;
    }

    if (2 * total_in + 64 * (n + 1) > 2000000000L) {
        /* int32 Arrow offsets would overflow; caller falls back */
        PyBuffer_Release(&data); PyBuffer_Release(&offs);
        PyErr_SetString(PyExc_OverflowError, "batch too large");
        return NULL;
    }
    Py_ssize_t tcap = 2 * total_in + 64 * (n + 1);
    uint8_t *text_data = PyMem_Malloc(tcap);
    int32_t *text_off = PyMem_Malloc((n + 1) * sizeof(int32_t));
    uint8_t *title_data = PyMem_Malloc(tcap);
    int32_t *title_off = PyMem_Malloc((n + 1) * sizeof(int32_t));
    uint8_t *mask = PyMem_Malloc(n > 0 ? n : 1);
    P *p = PyMem_Malloc(sizeof(P));
    if (p) { p->scratch = NULL; p->scratch_cap = 0; }
    if (!text_data || !text_off || !title_data || !title_off || !mask || !p) {
        PyBuffer_Release(&data); PyBuffer_Release(&offs);
        PyMem_Free(text_data); PyMem_Free(text_off); PyMem_Free(title_data);
        PyMem_Free(title_off); PyMem_Free(mask); PyMem_Free(p);
        return PyErr_NoMemory();
    }
    Py_ssize_t tpos = 0, dpos = 0;
    long n_bails = 0;
    text_off[0] = 0; title_off[0] = 0;

    for (Py_ssize_t i = 0; i < n; i++) {
        Py_ssize_t s0 = large ? o64[arr_offset + i] : o32[arr_offset + i];
        Py_ssize_t s1 = large ? o64[arr_offset + i + 1] : o32[arr_offset + i + 1];
        const uint8_t *doc = base + s0;
        Py_ssize_t dlen = s1 - s0;
        int bailed = 1;
        if (!memchr(doc, 0, dlen)) {
            memset(p, 0, offsetof(P, unk_names));
            p->n_unk = 0;
            p->s = doc; p->n = dlen;
            p->out = text_data + tpos;
            p->out_cap = 2 * dlen + 64;
            p->mode = M_PRE;
            p->pending_end = -1;
            if (scope) {
                p->scope_id = (const uint8_t *)scope;
                p->scope_id_len = (int)scope_len;
            }
            run_parse(p);
            if (!p->bail && p->n_pend) pend_flush(p);
            if (!p->bail && p->scope_active) {
                p->scope_b = p->olen;
                p->scope_active = 0;
            }
            if (!p->bail) {
                bailed = 0;
                /* final strip (arena.node_text) */
                Py_ssize_t a = 0, b = p->olen;
                if (scope) {
                    if (p->scope_done) { a = p->scope_a; b = p->scope_b; }
                    else { a = b = 0; }
                }
                while (a < b) {
                    uint8_t c = p->out[a];
                    if (c=='\t'||c=='\n'||c=='\f'||c=='\r'||c==' ') a++;
                    else break;
                }
                while (b > a) {
                    uint8_t c = p->out[b - 1];
                    if (c=='\t'||c=='\n'||c=='\f'||c=='\r'||c==' ') b--;
                    else break;
                }
                if (a > 0) memmove(p->out, p->out + a, b - a);
                tpos += b - a;
                if (p->title_set)
                    dpos += normalize_title(doc, p->title_a, p->title_b,
                                            dlen, title_data + dpos);
            }
        }
        mask[i] = (uint8_t)bailed;
        if (bailed) n_bails++;
        text_off[i + 1] = (int32_t)tpos;
        title_off[i + 1] = (int32_t)dpos;
    }
    PyBuffer_Release(&data); PyBuffer_Release(&offs);

    PyObject *r = Py_BuildValue(
        "y#y#y#y#y#l",
        (const char *)text_data, tpos,
        (const char *)text_off, (Py_ssize_t)((n + 1) * sizeof(int32_t)),
        (const char *)title_data, dpos,
        (const char *)title_off, (Py_ssize_t)((n + 1) * sizeof(int32_t)),
        (const char *)mask, n,
        n_bails);
    PyMem_Free(text_data); PyMem_Free(text_off); PyMem_Free(title_data);
    PyMem_Free(title_off); PyMem_Free(mask);
    PyMem_Free(p->scratch); PyMem_Free(p);
    return r;
}

/* init_tables(tags: list[(bytes, int)], semi: list[(bytes, bytes)],
 *             nosemi: list[(bytes, bytes)], max_ent_name: int) */
static PyObject *py_init_tables(PyObject *self, PyObject *args) {
    PyObject *tags, *semi, *nosemi;
    int max_name;
    if (!PyArg_ParseTuple(args, "OOOi", &tags, &semi, &nosemi, &max_name))
        return NULL;
    if (g_ready) Py_RETURN_NONE;
    g_max_ent_name = max_name;

    Py_ssize_t ntags = PyList_Size(tags);
    Py_ssize_t nsemi = PyList_Size(semi);
    Py_ssize_t nnosemi = PyList_Size(nosemi);

    /* name arena sizing */
    Py_ssize_t arena_sz = 0, ent_sz = 0;
    for (Py_ssize_t i = 0; i < ntags; i++)
        arena_sz += PyBytes_Size(PyTuple_GetItem(PyList_GetItem(tags, i), 0)) + 1;
    for (Py_ssize_t i = 0; i < nsemi; i++) {
        PyObject *t = PyList_GetItem(semi, i);
        ent_sz += PyBytes_Size(PyTuple_GetItem(t, 0)) +
                  PyBytes_Size(PyTuple_GetItem(t, 1)) + 2;
    }
    for (Py_ssize_t i = 0; i < nnosemi; i++) {
        PyObject *t = PyList_GetItem(nosemi, i);
        ent_sz += PyBytes_Size(PyTuple_GetItem(t, 0)) +
                  PyBytes_Size(PyTuple_GetItem(t, 1)) + 2;
    }
    g_name_arena = malloc(arena_sz);
    g_ent_arena = malloc(ent_sz);
    if (!g_name_arena || !g_ent_arena) return PyErr_NoMemory();
    char *np = g_name_arena, *ep = g_ent_arena;

    memset(g_tags, 0, sizeof(g_tags));
    memset(g_semi, 0, sizeof(g_semi));
    memset(g_nosemi, 0, sizeof(g_nosemi));
    memset(g_flags_by_id, 0, sizeof(g_flags_by_id));

    for (Py_ssize_t i = 0; i < ntags; i++) {
        PyObject *t = PyList_GetItem(tags, i);
        char *nm; Py_ssize_t nl;
        PyBytes_AsStringAndSize(PyTuple_GetItem(t, 0), &nm, &nl);
        long fl = PyLong_AsLong(PyTuple_GetItem(t, 1));
        memcpy(np, nm, nl);
        uint32_t h = fnv1a((const uint8_t *)np, nl) & 2047;
        while (g_tags[h].name) h = (h + 1) & 2047;
        g_tags[h].name = np; g_tags[h].len = (int)nl; g_tags[h].id = (int)i;
        g_flags_by_id[i] = (uint32_t)fl;
        np += nl; *np++ = 0;
    }
    g_nknown = (int)ntags;

    for (Py_ssize_t i = 0; i < nsemi + nnosemi; i++) {
        PyObject *t = (i < nsemi) ? PyList_GetItem(semi, i)
                                  : PyList_GetItem(nosemi, i - nsemi);
        EntSlot *tab = (i < nsemi) ? g_semi : g_nosemi;
        int mask = (i < nsemi) ? 8191 : 511;
        char *nm, *vv; Py_ssize_t nl, vl;
        PyBytes_AsStringAndSize(PyTuple_GetItem(t, 0), &nm, &nl);
        PyBytes_AsStringAndSize(PyTuple_GetItem(t, 1), &vv, &vl);
        char *kn = ep; memcpy(ep, nm, nl); ep += nl; *ep++ = 0;
        char *kv = ep; memcpy(ep, vv, vl); ep += vl; *ep++ = 0;
        uint32_t h = fnv1a((const uint8_t *)kn, nl) & mask;
        while (tab[h].name) h = (h + 1) & mask;
        tab[h].name = kn; tab[h].nlen = (int)nl;
        tab[h].val = kv; tab[h].vlen = (int)vl;
    }

    /* resolve well-known ids */
#define R(var, nm) var = tag_lookup((const uint8_t *)nm, (int)strlen(nm))
    R(T_p,"p"); R(T_li,"li"); R(T_br,"br"); R(T_a,"a"); R(T_form,"form");
    R(T_head,"head"); R(T_body,"body"); R(T_html,"html"); R(T_title,"title");
    R(T_textarea,"textarea"); R(T_script,"script"); R(T_style,"style");
    R(T_noscript,"noscript"); R(T_noframes,"noframes"); R(T_pre,"pre");
    R(T_listing,"listing"); R(T_xmp,"xmp"); R(T_iframe,"iframe");
    R(T_noembed,"noembed"); R(T_button,"button"); R(T_option,"option");
    R(T_optgroup,"optgroup"); R(T_ruby,"ruby"); R(T_rp,"rp"); R(T_rt,"rt");
    R(T_nobr,"nobr"); R(T_img,"img"); R(T_image,"image"); R(T_input,"input");
    R(T_hr,"hr"); R(T_dd,"dd"); R(T_dt,"dt"); R(T_base,"base");
    R(T_basefont,"basefont"); R(T_bgsound,"bgsound"); R(T_command,"command");
    R(T_link,"link"); R(T_meta,"meta"); R(T_ol,"ol"); R(T_ul,"ul");
    R(T_table,"table"); R(T_caption,"caption"); R(T_colgroup,"colgroup");
    R(T_col,"col"); R(T_tbody,"tbody"); R(T_thead,"thead");
    R(T_tfoot,"tfoot"); R(T_tr,"tr"); R(T_td,"td"); R(T_th,"th");
    R(T_select,"select"); R(T_keygen,"keygen");
#undef R

    /* byte classes */
    memset(g_bclass, BC_PLAIN, 256);
    g_bclass['\t'] = g_bclass['\n'] = g_bclass['\f'] = g_bclass['\r'] =
        g_bclass[' '] = BC_WS;
    g_bclass['&'] = BC_AMP;
    g_bclass[0xC2] = BC_C2;

    g_ready = 1;
    Py_RETURN_NONE;
}

/* ---- MD5 (implemented from the RFC 1321 algorithm description) ------
 * Used by the dedup operators' portable hash family: the SimHash /
 * MinHash kernels hash each unique word with md5 so a DuckDB oracle can
 * replay signatures bit-exactly; this removes the per-word Python
 * hashlib loop (the one remaining Python hot loop flagged in round 2). */
static const uint32_t MD5_K[64] = {
    0xd76aa478u,0xe8c7b756u,0x242070dbu,0xc1bdceeeu,
    0xf57c0fafu,0x4787c62au,0xa8304613u,0xfd469501u,
    0x698098d8u,0x8b44f7afu,0xffff5bb1u,0x895cd7beu,
    0x6b901122u,0xfd987193u,0xa679438eu,0x49b40821u,
    0xf61e2562u,0xc040b340u,0x265e5a51u,0xe9b6c7aau,
    0xd62f105du,0x02441453u,0xd8a1e681u,0xe7d3fbc8u,
    0x21e1cde6u,0xc33707d6u,0xf4d50d87u,0x455a14edu,
    0xa9e3e905u,0xfcefa3f8u,0x676f02d9u,0x8d2a4c8au,
    0xfffa3942u,0x8771f681u,0x6d9d6122u,0xfde5380cu,
    0xa4beea44u,0x4bdecfa9u,0xf6bb4b60u,0xbebfbc70u,
    0x289b7ec6u,0xeaa127fau,0xd4ef3085u,0x04881d05u,
    0xd9d4d039u,0xe6db99e5u,0x1fa27cf8u,0xc4ac5665u,
    0xf4292244u,0x432aff97u,0xab9423a7u,0xfc93a039u,
    0x655b59c3u,0x8f0ccc92u,0xffeff47du,0x85845dd1u,
    0x6fa87e4fu,0xfe2ce6e0u,0xa3014314u,0x4e0811a1u,
    0xf7537e82u,0xbd3af235u,0x2ad7d2bbu,0xeb86d391u};
static const uint8_t MD5_S[64] = {
    7,12,17,22,7,12,17,22,7,12,17,22,7,12,17,22,
    5, 9,14,20,5, 9,14,20,5, 9,14,20,5, 9,14,20,
    4,11,16,23,4,11,16,23,4,11,16,23,4,11,16,23,
    6,10,15,21,6,10,15,21,6,10,15,21,6,10,15,21};

static void md5_block(uint32_t st[4], const uint8_t *p) {
    uint32_t M[16];
    int i;
    for (i = 0; i < 16; i++)
        M[i] = (uint32_t)p[4*i] | ((uint32_t)p[4*i+1] << 8) |
               ((uint32_t)p[4*i+2] << 16) | ((uint32_t)p[4*i+3] << 24);
    uint32_t a = st[0], b = st[1], c = st[2], d = st[3];
    for (i = 0; i < 64; i++) {
        uint32_t f; int g;
        if (i < 16)      { f = (b & c) | (~b & d); g = i; }
        else if (i < 32) { f = (d & b) | (~d & c); g = (5*i + 1) & 15; }
        else if (i < 48) { f = b ^ c ^ d;          g = (3*i + 5) & 15; }
        else             { f = c ^ (b | ~d);       g = (7*i) & 15; }
        uint32_t tmp = d;
        d = c; c = b;
        uint32_t x = a + f + MD5_K[i] + M[g];
        b = b + ((x << MD5_S[i]) | (x >> (32 - MD5_S[i])));
        a = tmp;
    }
    st[0] += a; st[1] += b; st[2] += c; st[3] += d;
}

static void md5_digest(const uint8_t *msg, size_t len, uint8_t out[16]) {
    uint32_t st[4] = {0x67452301u, 0xefcdab89u, 0x98badcfeu, 0x10325476u};
    size_t i = 0;
    int k;
    for (; i + 64 <= len; i += 64) md5_block(st, msg + i);
    uint8_t tail[128];
    size_t r = len - i;
    if (r) memcpy(tail, msg + i, r);
    tail[r++] = 0x80;
    size_t pad = (r <= 56) ? 64 : 128;
    memset(tail + r, 0, pad - 8 - r);
    uint64_t bits = (uint64_t)len << 3;
    for (k = 0; k < 8; k++) tail[pad - 8 + k] = (uint8_t)(bits >> (8 * k));
    md5_block(st, tail);
    if (pad == 128) md5_block(st, tail + 64);
    for (k = 0; k < 4; k++) {
        out[4*k]     = (uint8_t)(st[k]);
        out[4*k + 1] = (uint8_t)(st[k] >> 8);
        out[4*k + 2] = (uint8_t)(st[k] >> 16);
        out[4*k + 3] = (uint8_t)(st[k] >> 24);
    }
}

/* batch_md5_prefix64(data: buffer, offsets: buffer, n: int,
 *                    arr_offset: int, large: bool) -> bytes
 *
 * Zero-copy over an Arrow StringArray's raw buffers (same interface as
 * batch_extract): per string, the first 8 digest bytes of md5 read
 * big-endian — returned as n native uint64 values (numpy-frombuffer
 * ready). This is `int.from_bytes(md5(w).digest()[:8], "big")`. */
static PyObject *py_batch_md5_prefix64(PyObject *self, PyObject *args) {
    Py_buffer data, offs;
    Py_ssize_t n, arr_offset;
    int large;
    if (!PyArg_ParseTuple(args, "y*y*nnp", &data, &offs, &n, &arr_offset,
                          &large))
        return NULL;
    const uint8_t *base = (const uint8_t *)data.buf;
    const int32_t *o32 = (const int32_t *)offs.buf;
    const int64_t *o64 = (const int64_t *)offs.buf;
    uint64_t *out = PyMem_Malloc((n > 0 ? n : 1) * sizeof(uint64_t));
    if (!out) {
        PyBuffer_Release(&data); PyBuffer_Release(&offs);
        return PyErr_NoMemory();
    }
    for (Py_ssize_t i = 0; i < n; i++) {
        Py_ssize_t s0 = large ? o64[arr_offset + i] : o32[arr_offset + i];
        Py_ssize_t s1 = large ? o64[arr_offset + i + 1] : o32[arr_offset + i + 1];
        uint8_t d[16];
        md5_digest(base + s0, (size_t)(s1 - s0), d);
        uint64_t v = 0;
        for (int k = 0; k < 8; k++) v = (v << 8) | d[k];
        out[i] = v;
    }
    PyBuffer_Release(&data); PyBuffer_Release(&offs);
    PyObject *r = PyBytes_FromStringAndSize((const char *)out,
                                            n * (Py_ssize_t)sizeof(uint64_t));
    PyMem_Free(out);
    return r;
}

static PyMethodDef methods[] = {
    {"init_tables", py_init_tables, METH_VARARGS,
     "init tag/entity tables (once per process)"},
    {"doc_text", py_doc_text, METH_VARARGS,
     "doc_text(html) -> (text, title|None) or None on bail-out"},
    {"batch_extract", py_batch_extract, METH_VARARGS,
     "batch over raw Arrow utf8 buffers; returns arrow-ready buffers"},
    {"batch_md5_prefix64", py_batch_md5_prefix64, METH_VARARGS,
     "per-string uint64 md5 prefix over raw Arrow utf8 buffers"},
    {NULL, NULL, 0, NULL}
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fastpath",
    "streaming HTML->text fast path", -1, methods
};

PyMODINIT_FUNC PyInit__fastpath(void) {
    return PyModule_Create(&moduledef);
}
